package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins RegexpGroups (single-pass multi-group extraction) to the exact
  * semantics of per-group `regexp_extract` over the grok patterns the
  * DocParser runs, including the edge cases: whole-pattern miss → NULL
  * array, non-participating group → "", null input → NULL. */
class RegexpGroupsSpec extends SparkTestBase {

  import graft.parse.DocParser.{ErrorRe, ToolCallRe}

  private val samples: Seq[String] = Seq(
    "WARN query plan CALL bash(arg=7) -> ERR ERROR[503]: shuffle failed",
    "CALL sql() -> OK",                        // empty args group
    "INFO the quick brown fox",                // no match at all
    "CALL truncated(",                         // opener but no full match
    "ERROR[042]: ",                            // empty trailing message group
    "prefix CALL a_b(x) -> OK suffix CALL c(y) -> ERR", // first match wins
    "café 中文 περιβάλλον CALL tr(arg=é) -> OK",         // multi-byte UTF-8 around+inside groups
    ""
  )

  test("agrees with regexp_extract on every group of both grok patterns") {
    import spark.implicits._
    val df = samples.toDF("t")
    for ((re, nGroups) <- Seq(ToolCallRe -> 3, ErrorRe -> 2); g <- 1 to nGroups) {
      val got = df.select(
        // regexp_extract returns "" on a whole-pattern miss; align the
        // groups form with coalesce to compare the group strings themselves
        coalesce(RegexpGroups.groups(col("t"), re).getItem(g - 1), lit("")),
        regexp_extract(col("t"), re, g)).collect()
      got.zip(samples).foreach { case (r, s) =>
        assert(r.getString(0) === r.getString(1), s"pattern=$re group=$g text=$s")
      }
    }
  }

  test("whole-pattern miss yields NULL array; null input yields NULL") {
    import spark.implicits._
    val df = Seq(Some("no tool call here"), None).toDF("t")
      .select(RegexpGroups.groups(col("t"), ToolCallRe).as("g"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = samples.toDF("t")
    val viaCodegen: Seq[Option[Seq[String]]] =
      df.select(RegexpGroups.groups(col("t"), ToolCallRe)).collect().toSeq.map { r =>
        if (r.isNullAt(0)) None else Some(r.getSeq[String](0).toSeq)
      }
    val viaEval: Seq[Option[Seq[String]]] = samples.map { s =>
      val e = RegexpGroups(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType),
        ToolCallRe)
      Option(e.eval(null)).map(
        _.asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .array.toSeq.map(_.toString))
    }
    assert(viaCodegen === viaEval)
  }
}
