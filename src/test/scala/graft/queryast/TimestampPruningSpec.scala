package graft.queryast

import graft.SparkTestBase
import graft.queryast.QueryAst._

/** Golden cases ported from the reference's own
  * `test_extract_timestamp_range_from_ast`
  * (quickwit-search/src/root.rs:3590-3704). The reference works in epoch
  * SECONDS (its split metadata resolution); ours in µs — cases where the
  * reference's secs truncation/round-up makes the values differ are pinned
  * to the exact-µs semantics documented at TimestampPruning's header. */
class TimestampPruningSpec extends SparkTestBase {

  private val TsF = "timestamp"
  private def us(iso: String): Long =
    java.time.Instant.parse(iso).getEpochSecond * 1000000L +
      java.time.Instant.parse(iso).getNano / 1000L

  private val lo = "2021-04-13T22:45:41Z" // 1618353941
  private val hi = "2021-05-06T06:51:19Z" // 1620283879

  private val simpleRange = Range(TsF, gte = Some(lo), lt = Some(hi))

  test("direct range: [incl, excl) maps to exact µs bounds") {
    assert(TimestampPruning.refine(simpleRange, TsF) ===
      (Some(us(lo)), Some(us(hi))))
    // root.rs asserts (1618353941, 1620283879) secs — ×1e6 here exactly
    assert(us(lo) === 1618353941000000L && us(hi) === 1620283879000000L)
  }

  test("range inside bool.must refines; inside bool.should does not") {
    assert(TimestampPruning.refine(Bool(must = Seq(simpleRange)), TsF) ===
      (Some(us(lo)), Some(us(hi))))
    assert(TimestampPruning.refine(Bool(filterQ = Seq(simpleRange)), TsF) ===
      (Some(us(lo)), Some(us(hi))))
    // should branch ignored: preset start survives, end stays None
    assert(TimestampPruning.refine(Bool(should = Seq(simpleRange)), TsF,
      start = Some(123L)) === (Some(123L), None))
    // mustNot ignored too (pruning on negation is unsound)
    assert(TimestampPruning.refine(Bool(mustNot = Seq(simpleRange)), TsF) ===
      (None, None))
  }

  test("bounds combine by intersection (max of starts, min of ends)") {
    // start already more restrictive
    assert(TimestampPruning.refine(simpleRange, TsF,
      start = Some(1618601297000000L), end = Some(Long.MaxValue)) ===
      (Some(1618601297000000L), Some(us(hi))))
    // end already more restrictive
    assert(TimestampPruning.refine(simpleRange, TsF,
      start = Some(1L), end = Some(1618601297000000L)) ===
      (Some(us(lo)), Some(1618601297000000L)))
  }

  test("(start..end] bounds: excluded lower and included upper bump by 1µs") {
    val unusual = Range(TsF, gt = Some(lo), lte = Some(hi))
    // reference (secs): (1618353942, 1620283880); exact-µs: +1µs not +1s
    assert(TimestampPruning.refine(unusual, TsF) ===
      (Some(us(lo) + 1L), Some(us(hi) + 1L)))
  }

  test("range on another field is uninformative") {
    val wrong = Range("other_field", gte = Some(lo), lt = Some(hi))
    assert(TimestampPruning.refine(wrong, TsF) === (None, None))
  }

  test("sub-second precision is preserved exactly (reference rounds to secs)") {
    val hp = Range(TsF, gte = Some("2021-04-13T22:45:41.001Z"),
      lt = Some("2021-05-06T06:51:19.001Z"))
    // reference (secs): (1618353941, 1620283880) — truncation + round-up
    assert(TimestampPruning.refine(hp, TsF) ===
      (Some(1618353941001000L), Some(1620283879001000L)))
  }

  test("term pins DATE..=DATE; termset takes lexicographic first/last") {
    assert(TimestampPruning.refine(Term(TsF, lo), TsF) ===
      (Some(us(lo)), Some(us(lo) + 1L)))
    // rfc3339 is lexicographically ordered (root.rs:1304-1306)
    assert(TimestampPruning.refine(TermSet(TsF, Seq(hi, lo)), TsF) ===
      (Some(us(lo)), Some(us(hi) + 1L)))
  }

  test("integer bounds get unit inference; bad literals are skipped") {
    // secs-magnitude integer
    assert(TimestampPruning.refine(Range(TsF, gte = Some(1618353941L)), TsF)._1 ===
      Some(1618353941000000L))
    // millis-magnitude integer
    assert(TimestampPruning.refine(Range(TsF, gte = Some(1618353941000L)), TsF)._1 ===
      Some(1618353941000000L))
    // plain date string → midnight UTC
    assert(TimestampPruning.refine(Range(TsF, lt = Some("2021-04-14")), TsF)._2 ===
      Some(us("2021-04-14T00:00:00Z")))
    // unparseable bound: skipped, not an error (root.rs:1224-1226)
    assert(TimestampPruning.refine(Range(TsF, gte = Some("not a date")), TsF) ===
      (None, None))
  }

  test("TsRange intersects directly (already [start..end) µs)") {
    val q = Bool(filterQ = Seq(
      TsRange(TsF, Some(1000000L), Some(5000000L)),
      TsRange(TsF, Some(2000000L), Some(9000000L))))
    assert(TimestampPruning.refine(q, TsF) === (Some(2000000L), Some(5000000L)))
  }

  test("scan: query-implied time bounds prune file groups (never lossy)") {
    import spark.implicits._
    import graft.model.TranscriptGen
    import graft.publish.Checkpoint
    val dir = tmpDir("tsprune")
    val table = new graft.sources.TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 30, avgTurns = 5)
    val micros = turns.map(_.ts.getTime * 1000L)
    val mid = (micros.min + micros.max) / 2
    val df = turns.toDS().toDF()
    def delta(from: Long, to: Long) =
      Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("src", from, to)))
    // two single-file batches with disjoint time windows
    table.append(df.filter(s"unix_micros(ts) < $mid"), delta(-1, 50), numFiles = 1)
    table.append(df.filter(s"unix_micros(ts) >= $mid"), delta(50, 100), numFiles = 1)

    val midIso = java.time.Instant.ofEpochSecond(mid / 1000000L, (mid % 1000000L) * 1000L).toString
    val q = Bool(filterQ = Seq(Range("ts", gte = Some(midIso))))
    val scanned = table.scan(query = Some(q))
    // only the late-window file group is opened
    val snap = table.store.currentSnapshot().get
    val lateFiles = snap.splits.filter(_.timeRangeStartMicros >= mid).flatMap(_.files)
    def norm(fs: Iterable[String]): Set[String] =
      fs.map(_.replaceFirst("^file:/+", "/")).toSet
    assert(lateFiles.nonEmpty && norm(scanned.inputFiles) === norm(lateFiles))
    // pruning is never lossy: predicate over the scan gives the full answer
    val resolver = FieldResolver(Set.empty, Nil)
    val got = scanned.filter(q.toColumn(resolver)).count()
    assert(got === micros.count(_ >= mid).toLong)
  }

  test("whole Doubles take the i64-first unit-inference path (date_time_type.rs:80-83)") {
    // JSON numbers arrive as Double; an epoch-millis bound must not be read
    // as fractional seconds (year ~55000)
    assert(TimestampPruning.interpretMicros(1.7040672e12) === Some(1704067200000000L))
    // and a whole SECONDS-magnitude double likewise infers seconds
    assert(TimestampPruning.interpretMicros(1.7040672e9) === Some(1704067200000000L))
    // genuinely fractional doubles stay fractional seconds
    assert(TimestampPruning.interpretMicros(1704067200.5) === Some(1704067200500000L))
  }

  test("Range.toColumn and pruning interpret numeric ts bounds identically (never lossy)") {
    import spark.implicits._
    val base = 1704067200L // 2024-01-01T00:00:00Z, seconds
    val df = (0 until 10).map { i =>
      (i.toLong, new java.sql.Timestamp((base + i * 60) * 1000L))
    }.toDF("id", "ts")
    val resolver = FieldResolver(Set.empty, Nil)
    // programmatic Long epoch-MILLIS lower bound: rows from minute 5 on
    val boundMillis = (base + 5 * 60) * 1000L
    val q = Range("ts", gte = Some(boundMillis))
    assert(df.filter(q.toColumn(resolver)).count() === 5L)
    // the pruning window agrees with the filter — contract: pruning and the
    // row filter can never disagree on the same bound
    val (lo, hi) = TimestampPruning.refine(q, "ts")
    assert(lo === Some(boundMillis * 1000L) && hi === None)
    // JSON-shaped Double millis (ES DSL range) behaves the same
    val qd = Range("ts", gte = Some(boundMillis.toDouble))
    assert(df.filter(qd.toColumn(resolver)).count() === 5L)
    assert(TimestampPruning.refine(qd, "ts")._1 === Some(boundMillis * 1000L))
  }
}
