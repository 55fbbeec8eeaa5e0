package graft.publish

import graft.SparkTestBase
import graft.publish.ListSplits._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

case class SplitRow(
    split_id: String, split_state: String, tags: Seq[String],
    time_range_start: Option[Long], time_range_end: Option[Long],
    delete_opstamp: Long, update_timestamp: Long, create_timestamp: Long,
    maturation_period_secs: Option[Long], publish_timestamp: Option[Long])

/** Pins ListSplits on the reference's OWN test matrix:
  * file_backed_index/mod.rs:729-771 `make_splits`, :802-859
  * `test_single_filter_behaviour`, :861-900 `test_combination_filter`, and
  * metastore/mod.rs:711-797 FilterRange contains/overlaps goldens. */
class ListSplitsSpec extends SparkTestBase {
  import spark.implicits._

  // make_splits (file_backed_index/mod.rs:729-771)
  private val fixture = Seq(
    SplitRow("split-1", "Staged", Seq("tag-1"), Some(32L), Some(40L), 9L, 70L, 12L, None, None),
    SplitRow("split-2", "MarkedForDeletion", Seq("tag-2", "tag-3"), None, None, 4L, 50L, 5L, None, None),
    SplitRow("split-3", "Published", Seq("tag-2", "tag-4"), Some(0L), Some(90L), 0L, 0L, 64L, None, Some(10L)))

  private def df: DataFrame = fixture.toDF()

  private def ids(q: Query): Set[String] =
    ListSplits(df, q).select("split_id").collect().map(_.getString(0)).toSet

  test("single-filter behaviour (reference :802-859)") {
    assert(ids(Query(splitStates = Seq("Staged"))).contains("split-1"))
    assert(!ids(Query(splitStates = Seq("Published"))).contains("split-2"))
    val multi = ids(Query(splitStates = Seq("Published", "MarkedForDeletion")))
    assert(!multi.contains("split-1") && multi.contains("split-3"))

    assert(ids(Query(updateTimestamp = FilterRange.lt(51))) == Set("split-2", "split-3"))
    assert(ids(Query(createTimestamp = FilterRange.gte(51))) == Set("split-3"))
    assert(ids(Query(deleteOpstamp = FilterRange.gte(4))) == Set("split-1", "split-2"))
    // no-time-range split-2 passes every time filter
    assert(ids(Query(timeRange = FilterRange.gt(45))) == Set("split-2", "split-3"))
    assert(ids(Query(timeRange = FilterRange.lt(45))) == Set("split-1", "split-2", "split-3"))
    assert(ids(Query(tags = Some(Tag(isPresent = false, tag = "tag-2")))) == Set("split-1"))
  }

  test("combination filters (reference :861-900)") {
    assert(ids(Query(timeRange = FilterRange(Excluded(0), Excluded(40)))) ==
      Set("split-1", "split-2", "split-3"))
    assert(ids(Query(timeRange = FilterRange.gt(45), deleteOpstamp = FilterRange.gt(0))) ==
      Set("split-2"))
    assert(ids(Query(updateTimestamp = FilterRange.lt(51),
      splitStates = Seq("Published", "MarkedForDeletion"))) == Set("split-2", "split-3"))
    assert(ids(Query(updateTimestamp = FilterRange.lt(51),
      createTimestamp = FilterRange.lte(63))) == Set("split-2"))
    assert(ids(Query(timeRange = FilterRange.gt(90),
      tags = Some(Tag(isPresent = true, tag = "tag-1")))) == Set.empty[String])
  }

  test("FilterRange contains/overlaps goldens (metastore/mod.rs:711-797)") {
    def evalB(c: org.apache.spark.sql.Column): Boolean =
      Seq(1).toDF("x").select(c.as("v")).collect()(0).getBoolean(0)
    val f1 = FilterRange(Unbounded, Excluded(50))
    assert(!evalB(f1.contains(lit(50L))) && evalB(f1.contains(lit(0L))) && evalB(f1.contains(lit(49L))))
    val f2 = FilterRange(Included(50), Unbounded)
    assert(evalB(f2.contains(lit(50L))) && evalB(f2.contains(lit(51L))) && !evalB(f2.contains(lit(0L))))
    val f3 = FilterRange(Included(50), Excluded(75))
    assert(evalB(f3.contains(lit(50L))) && !evalB(f3.contains(lit(75L))) && evalB(f3.contains(lit(74L))))
    // overlaps: end-exclusive vs inclusive split ranges
    assert(evalB(f1.overlaps(lit(0L), lit(50L))) && evalB(f1.overlaps(lit(32L), lit(32L))) &&
      !evalB(f1.overlaps(lit(51L), lit(76L))) && !evalB(f1.overlaps(lit(50L), lit(76L))))
    val f4 = FilterRange(Unbounded, Included(50))
    assert(evalB(f4.overlaps(lit(50L), lit(76L))) && !evalB(f4.overlaps(lit(51L), lit(76L))))
    val f5 = FilterRange(Excluded(50), Unbounded)
    assert(evalB(f5.overlaps(lit(50L), lit(76L))) && !evalB(f5.overlaps(lit(0L), lit(50L))))
    assert(evalB(FilterRange(Included(50), Excluded(75)).overlaps(lit(74L), lit(124L))) &&
      !evalB(FilterRange(Included(50), Excluded(75)).overlaps(lit(75L), lit(124L))))
  }

  test("maturity bound EARLY-RETURNS, skipping the time-range check (mod.rs:704-718)") {
    val rows = Seq(
      // mature (no period), time range DISJOINT from the query range
      SplitRow("m-1", "Published", Nil, Some(1000L), Some(2000L), 0L, 0L, 100L, None, None),
      // immature until 600 (100 + 500), time range inside the query
      SplitRow("m-2", "Published", Nil, Some(0L), Some(10L), 0L, 0L, 100L, Some(500L), None),
      // matured exactly at eval 200 (100 + 100 <= 200)
      SplitRow("m-3", "Published", Nil, Some(0L), Some(10L), 0L, 0L, 100L, Some(100L), None))
    val d = rows.toDF()
    // time filter alone would keep only m-2/m-3 …
    assert(ListSplits(d, Query(timeRange = FilterRange.lt(50)))
      .select("split_id").collect().map(_.getString(0)).toSet == Set("m-2", "m-3"))
    // … but with a maturity bound the time filter is skipped: m-1 (mature)
    // passes at eval 150 despite its disjoint range
    assert(ListSplits(d, Query(timeRange = FilterRange.lt(50), mature = Included(150L)))
      .select("split_id").collect().map(_.getString(0)).toSet == Set("m-1"))
    assert(ListSplits(d, Query(mature = Included(200L)))
      .select("split_id").collect().map(_.getString(0)).toSet == Set("m-1", "m-3"))
    assert(ListSplits(d, Query(mature = Excluded(150L)))
      .select("split_id").collect().map(_.getString(0)).toSet == Set("m-2", "m-3"))
  }

  test("staleness sort (delete_opstamp, publish_timestamp nulls-first) + offset/limit") {
    val out = ListSplits(df, Query(sortByStaleness = true))
      .select("split_id").collect().map(_.getString(0)).toSeq
    // split-3 del 0; split-2 del 4; split-1 del 9
    assert(out == Seq("split-3", "split-2", "split-1"))
    val ties = Seq(
      SplitRow("a", "Staged", Nil, None, None, 1L, 0L, 0L, None, Some(5L)),
      SplitRow("b", "Staged", Nil, None, None, 1L, 0L, 0L, None, None),
      SplitRow("c", "Staged", Nil, None, None, 0L, 0L, 0L, None, Some(99L))).toDF()
    // None < Some on publish_timestamp within equal opstamps (Rust Option ord)
    assert(ListSplits(ties, Query(sortByStaleness = true))
      .select("split_id").collect().map(_.getString(0)).toSeq == Seq("c", "b", "a"))
    // pagination without staleness follows split_id order (BTreeMap analog)
    assert(ListSplits(df, Query(offset = 1, limit = Some(1)))
      .select("split_id").collect().map(_.getString(0)).toSeq == Seq("split-2"))
    // with a limit the staleness sort must collapse to TakeOrdered, not a
    // global sort-exchange (the multi-million-split metastore plan)
    val plan = ListSplits(df, Query(sortByStaleness = true, limit = Some(2)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
