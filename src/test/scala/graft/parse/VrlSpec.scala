package graft.parse

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** VRL-subset transform tests, anchored on the reference's canonical
  * example script (source_config/mod.rs:195). */
class VrlSpec extends SparkTestBase {

  private def df = {
    import spark.implicits._
    Seq(("Hello World", "USER", "42"), ("BYE", "tool", "x"))
      .toDF("message", "role", "num")
  }

  test("the reference's canonical script: downcase(string!(.message))") {
    val out = Vrl.transform(".message = downcase(string!(.message))")(df)
      .select("message").collect().map(_.getString(0)).toSeq
    assert(out === Seq("hello world", "bye"))
  }

  test("multi-statement: assign, copy, literal, del — applied in order") {
    val out = Vrl.transform(
      """.role = downcase(.role);
        |.msg_len = strlen(.message);
        |.source = "vrl";
        |del(.message)""".stripMargin)(df)
    assert(out.columns.toSeq === Seq("role", "num", "msg_len", "source"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("user", "tool"))
    assert(rows.map(_.getLong(2)).toSeq === Seq(11L, 3L))
    assert(rows.forall(_.getString(3) == "vrl"))
  }

  test("to_int: bare form nulls on failure, bang form throws (ANSI)") {
    val ok = Vrl.transform(".n = to_int(.num)")(df)
      .select("n").collect().map(r => Option(r.get(0))).toSeq
    assert(ok === Seq(Some(42L), None))
    intercept[Exception] {
      Vrl.transform(".n = to_int!(.num)")(df).select("n").collect()
    }
  }

  test("strict: unknown functions and malformed statements are compile errors") {
    intercept[IllegalArgumentException](Vrl.transform(".x = frobnicate(.y)")(df))
    intercept[IllegalArgumentException](Vrl.parse("message = 1"))
  }
}
