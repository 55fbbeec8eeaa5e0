package graft.publish

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The janitor's delete-task planning pass
  * (quickwit-janitor/src/actors/delete_task_planner.rs:143-290): fetch the
  * stalest Published mature splits whose `delete_opstamp` lags the index's
  * last delete opstamp, match each against the pending delete tasks newer
  * than its opstamp, and split the batch into "has deletes → plan a
  * delete-and-merge rewrite" vs "no matching task → just bump the opstamp".
  *
  * Spark shape: the metastore is a split-metadata frame ([[ListSplits]]
  * answers `list_stale_splits`), the pending delete tasks are a tiny frame
  * broadcast to every task, and the match is one theta-join + per-split
  * count — no collect, no loop over splits (the reference loops because its
  * metastore is an RPC; a frame join does the whole batch at once).
  */
object DeleteTaskPlanner {

  /** `list_stale_splits` (quickwit-metastore file_backed/mod.rs:653-666):
    * Published splits with delete_opstamp &lt; the index's last opstamp,
    * mature as of `nowSec`, stalest first, capped at `numSplits`
    * (NUM_STALE_SPLITS_TO_FETCH = 1000, delete_task_planner.rs:48). */
  def listStaleSplits(splits: DataFrame, lastDeleteOpstamp: Long, nowSec: Long,
                      numSplits: Int = 1000): DataFrame =
    ListSplits(splits, ListSplits.Query(
      splitStates = Seq("Published"),
      deleteOpstamp = ListSplits.FilterRange.lt(lastDeleteOpstamp),
      mature = ListSplits.Included(nowSec),
      sortByStaleness = true,
      limit = Some(numSplits)))

  /** `partition_splits_by_deletes` (delete_task_planner.rs:220-289) at the
    * metadata level: a pending task matches a split when the task is newer
    * (`task_opstamp > delete_opstamp`, the ListDeleteTasks contract), its
    * half-open [start_ts, end_ts) range is not disjoint from the split's
    * inclusive time range (quickwit-common/src/lib.rs:105-129
    * extract_time_range + is_disjoint, i64::MIN/MAX for open ends;
    * either side rangeless → matches), and its tag — null = match-all —
    * passes the split's tag set (metastore/src/lib.rs:75-97).
    *
    * Task frame columns: opstamp, start_ts, end_ts (nullable µs), tag
    * (nullable). Output: the stale splits + `n_matching_tasks` and
    * `action` ∈ {delete_and_merge, bump_opstamp}. The reference then also
    * leaf-searches each candidate split to drop no-op rewrites
    * (has_split_docs_to_delete); that refinement composes downstream with
    * the doc-level rewrite (`m_delete_rewrite`).
    */
  def partitionByDeletes(staleSplits: DataFrame, tasks: DataFrame): DataFrame = {
    val t = broadcast(tasks.select(
      col("opstamp").as("task_opstamp"),
      col("start_ts"), col("end_ts"), col("tag")))
    val timeOk = col("time_range_start").isNull ||
      (col("start_ts").isNull && col("end_ts").isNull) ||
      !(coalesce(col("end_ts"), lit(Long.MaxValue)) <= col("time_range_start") ||
        col("time_range_end") < coalesce(col("start_ts"), lit(Long.MinValue)))
    val tagOk = col("tag").isNull ||
      coalesce(array_contains(col("tags"), col("tag")), lit(false))
    staleSplits
      .join(t, col("task_opstamp") > col("delete_opstamp") && timeOk && tagOk, "left")
      .groupBy(col("split_id"), col("delete_opstamp"))
      .agg(count(col("task_opstamp")).as("n_matching_tasks"))
      .withColumn("action",
        when(col("n_matching_tasks") > 0, lit("delete_and_merge"))
          .otherwise(lit("bump_opstamp")))
  }
}
