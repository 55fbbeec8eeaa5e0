package graft.queryast

import graft.SparkTestBase
import graft.publish.Checkpoint
import graft.sources.TranscriptTable
import org.apache.spark.sql.functions._

/** The reference's native-search-API timestamp scenario ported verbatim
  * (rest-api-tests/scenarii/qw_search_api/0001_ts_range.yaml +
  * _setup.quickwit.yaml): 5 docs across two splits, one missing its
  * timestamp; half-open [start, end) windows; query-language ts bounds in
  * epoch seconds and the `%Y/%m/%d` slash-date literal
  * (json_literal.rs:29-45 format chain). */
class TsRangeScenarioSpec extends SparkTestBase {

  private def delta(from: Long, to: Long) =
    Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("src", from, to)))

  private val resolver = FieldResolver(Set("text"), Seq("text"))

  test("ts_range scenario: windows, epoch bounds, slash date, missing ts") {
    import spark.implicits._
    val dir = tmpDir("tsrange")
    val table = new TranscriptTable(dir, spark)
    def frame(rows: Seq[(Int, Option[Long])]) = rows.map { case (i, sec) =>
      (s"conv$i", i, "user", s"doc$i", Option.empty[String],
        sec.map(s => new java.sql.Timestamp(s * 1000L)))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    // split 1: ts 1684993001, 1684993002; split 2: 03, 04, missing
    table.append(frame(Seq(1 -> Some(1684993001L), 2 -> Some(1684993002L))),
      delta(-1, 1), numFiles = 1)
    table.append(frame(Seq(3 -> Some(1684993003L), 4 -> Some(1684993004L),
      5 -> None)), delta(1, 2), numFiles = 1)

    def countWindow(sSec: Long, eSec: Long): Long = {
      val (s, e) = (sSec * 1000000L, eSec * 1000000L)
      table.scan(Some(s), Some(e))
        .filter(unix_micros(col("ts").cast("timestamp_ltz")).between(s, e - 1))
        .count()
    }
    assert(countWindow(1684993001L, 1684993002L) === 1L) // half-open window
    assert(countWindow(1684993002L, 1684993004L) === 2L)
    assert(countWindow(1684993002L, 1684993004L) === 2L) // repeatable

    def countQuery(q: String): Long = {
      val ast = UserQueryParser.parse(q, Seq("text"))
      table.scan(query = Some(ast)).filter(ast.toColumn(resolver)).count()
    }
    // slash-date literal: 2023/05/25 00:00Z < every real ts; the
    // missing-ts doc never matches a ts bound
    assert(countQuery("ts:>=2023/05/25") === 4L)
    // epoch-second literals with unit inference, [inclusive, exclusive)
    assert(countQuery("ts:>=1684993002 AND ts:<1684993004") === 2L)
  }
}
