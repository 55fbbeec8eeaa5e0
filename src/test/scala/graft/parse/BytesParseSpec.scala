package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bytes/IP leaf-parse tests (field_mapping_entry.rs:183-232 bytes formats,
  * mapping_tree.rs:77-86 IPv4→IPv6 mapping). */
class BytesParseSpec extends SparkTestBase {

  test("base64 round-trip") {
    import spark.implicits._
    val out = Seq("aGVsbG8=").toDF("b")
      .select(BytesParse.fromBase64(col("b")).cast("string")).collect()(0).getString(0)
    assert(out === "hello")
    val back = Seq("hello").toDF("s")
      .select(BytesParse.toBase64(col("s").cast("binary"))).collect()(0).getString(0)
    assert(back === "aGVsbG8=")
  }

  test("hex round-trip") {
    import spark.implicits._
    val out = Seq("68656c6c6f").toDF("h")
      .select(BytesParse.fromHex(col("h")).cast("string")).collect()(0).getString(0)
    assert(out === "hello")
    assert(evalStr[String]("hello", c => BytesParse.toHexStr(c.cast("binary"))) === "68656c6c6f")
  }

  test("IPv4 maps into IPv6 space; IPv6 canonicalizes to RFC 5952") {
    assert(evalStr[String]("127.0.0.1", BytesParse.normalizeIp) === "::ffff:127.0.0.1")
    assert(evalStr[String]("2001:DB8::1", BytesParse.normalizeIp) === "2001:db8::1")
  }

  test("equal addresses normalize to one string (ADVICE r1)") {
    // expansion variants of one address collapse
    assert(evalStr[String]("0:0:0:0:0:0:0:1", BytesParse.normalizeIp) === "::1")
    assert(evalStr[String]("::1", BytesParse.normalizeIp) === "::1")
    // IPv4-mapped hex form and dotted form agree
    assert(evalStr[String]("::FFFF:1.2.3.4", BytesParse.normalizeIp) === "::ffff:1.2.3.4")
    assert(evalStr[String]("::ffff:102:304", BytesParse.normalizeIp) === "::ffff:1.2.3.4")
    assert(evalStr[String]("1.2.3.4", BytesParse.normalizeIp) === "::ffff:1.2.3.4")
    // longest zero-run compression, lowercase
    assert(evalStr[String]("2001:0db8:0:0:1:0:0:1", BytesParse.normalizeIp) ===
      "2001:db8::1:0:0:1")
    assert(evalStr[String]("::", BytesParse.normalizeIp) === "::")
  }

  test("invalid addresses become NULL (parse error), not junk") {
    for (bad <- Seq("999.1.1.1", "1.2.3", "1.2.3.4.5", "g::1", "1::2::3", "hello", ""))
      assert(evalStr[String](bad, BytesParse.normalizeIp) === null, bad)
  }

  test("byFormat dispatch") {
    assert(evalStr[String]("6869", c => BytesParse.byFormat("hex")(c).cast("string")) === "hi")
    intercept[IllegalArgumentException](BytesParse.byFormat("binary"))
  }
}
