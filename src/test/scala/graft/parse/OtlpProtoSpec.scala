package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import OtlpProto._

/** OTLP logs protobuf codec: golden wire bytes, round-trip property,
  * unknown-field tolerance, proto3 default elision
  * (doc_processor.rs:154-161; opentelemetry-proto logs.proto). */
class OtlpProtoSpec extends AnyFunSuite {

  /** length-delimited field assembled from the wire spec, not the codec:
    * tag byte + single-byte length + payload (all test messages < 128 B). */
  private def ld(tag: Int, payloadHex: String): String = {
    require(payloadHex.length % 2 == 0 && payloadHex.length / 2 < 128)
    f"$tag%02x${payloadHex.length / 2}%02x$payloadHex"
  }

  test("golden wire bytes for a minimal request (independently assembled)") {
    // one resource attr ("svc" -> "a"); one record: time=1, sev=9,
    // text "INFO", body "hi", no attributes
    val req = LogsRequest(Seq("svc" -> "a"), Seq(
      LogRecord(1L, 9, "INFO", Some("hi"), Nil)))
    val got = encode(req).map(b => f"${b & 0xff}%02x").mkString

    val kv = ld(0x0a, "737663") + ld(0x12, ld(0x0a, "61")) // "svc" -> AnyValue("a")
    val resource = ld(0x0a, kv)
    val record = "090100000000000000" + "1009" +            // fixed64 time, varint sev
      ld(0x1a, "494e464f") + ld(0x2a, ld(0x0a, "6869"))     // "INFO", body AnyValue("hi")
    val scopeLogs = ld(0x12, record)
    val resourceLogs = ld(0x0a, resource) + ld(0x12, scopeLogs)
    assert(got === ld(0x0a, resourceLogs))
    assert(decode(encode(req)) === req)
  }

  test("round-trip property over arbitrary requests") {
    val str = Gen.alphaNumStr.map(_.take(12))
    val rec = for {
      t <- Gen.chooseNum(0L, Long.MaxValue)
      sev <- Gen.chooseNum(0, 24)
      st <- str
      body <- Gen.option(str)
      attrs <- Gen.listOfN(2, Gen.zip(Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(6)), str))
    } yield LogRecord(t, sev, st, body, attrs)
    val reqGen = for {
      ra <- Gen.listOfN(2, Gen.zip(Gen.const("res"), str))
      rs <- Gen.listOf(rec).map(_.take(8))
    } yield LogsRequest(ra, rs)
    val prop = Prop.forAll(reqGen) { r => decode(encode(r)) == r }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("unknown fields are skipped by wire type (real-exporter tolerance)") {
    // a record carrying unknown varint/fixed64/bytes fields before the body
    val record =
      "382a" +                      // field 7 varint 42
      "41" + "11" * 8 +             // field 8 fixed64
      ld(0x4a, "6162") +            // field 9 bytes "ab"
      ld(0x2a, ld(0x0a, "6869"))    // body AnyValue("hi")
    val root = ld(0x0a, ld(0x12, ld(0x12, record)))
    val bytes = root.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(decode(bytes) === LogsRequest(Nil,
      Seq(LogRecord(0L, 0, "", Some("hi"), Nil))))
  }

  test("truncated/corrupt length prefixes throw instead of decoding sibling bytes") {
    val good = encode(LogsRequest(Seq("k" -> "v"),
      Seq(LogRecord(7L, 9, "INFO", Some("hello"), Seq("a" -> "b")))))
    // chopping the tail off mid-message must never decode silently
    (1 until good.length).foreach { keep =>
      val t = good.take(keep)
      val r = try { decode(t); None } catch {
        case e: IllegalArgumentException => Some(e)
        case e: ArrayIndexOutOfBoundsException =>
          fail(s"unbounded read at keep=$keep: $e")
      }
      // either a clean decode error or (for cuts landing on a field
      // boundary of the outermost envelope) a shorter-but-valid prefix —
      // never an exception class that implies reading past the region
      r.foreach(e => assert(e.getMessage != null))
    }
    // an inner length prefix LARGER than its region: garbage-free failure
    val inflated = good.clone()
    inflated(1) = (inflated(1) + 40).toByte // ResourceLogs length lies
    intercept[IllegalArgumentException](decode(inflated))
  }

  test("proto3 defaults: zero/empty fields elided and restored") {
    val r = LogsRequest(Nil, Seq(LogRecord(0L, 0, "", None, Nil)))
    assert(decode(encode(r)) === r)
  }
}
