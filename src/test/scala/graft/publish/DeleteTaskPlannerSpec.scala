package graft.publish

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand vectors for the delete-task planning pass
  * (delete_task_planner.rs:143-289 + is_disjoint lib.rs:127-129). */
class DeleteTaskPlannerSpec extends SparkTestBase {
  import spark.implicits._

  private val splits = Seq(
    // split_id, state, tags, lo, hi, del_opstamp, upd, create, maturation, publish
    SplitRow("s-a", "Published", Seq("role:tool"), Some(100L), Some(200L), 2L, 0L, 0L, None, Some(1L)),
    SplitRow("s-b", "Published", Seq("role:user"), Some(300L), Some(400L), 6L, 0L, 0L, None, Some(2L)),
    SplitRow("s-c", "Published", Nil, None, None, 8L, 0L, 0L, None, Some(3L)),
    SplitRow("s-d", "Staged", Seq("role:tool"), Some(100L), Some(200L), 0L, 0L, 0L, None, None),
    SplitRow("s-e", "Published", Seq("role:tool"), Some(100L), Some(200L), 9L, 0L, 0L, None, Some(4L)))
    .toDF()

  test("listStaleSplits: Published + opstamp-lagging + mature only, stalest first") {
    val out = DeleteTaskPlanner.listStaleSplits(splits, lastDeleteOpstamp = 9L, nowSec = 1L)
      .select("split_id").collect().map(_.getString(0)).toSeq
    // s-d dropped (Staged), s-e dropped (opstamp 9 not < 9); stalest first
    assert(out == Seq("s-a", "s-b", "s-c"))
  }

  test("partitionByDeletes: opstamp strictness, time disjointness, tag + null-tag match") {
    val tasks = Seq(
      // newer than s-a only if opstamp > 2; [150,250) overlaps s-a's [100,200]
      (3L, Some(150L), Some(250L), Some("role:tool")),
      // tag matches s-b but [401,500) is disjoint from [300,400] (401 > 400)
      (7L, Some(401L), Some(500L), Some("role:user")),
      // match-all tag, rangeless → matches any split newer-than-opstamp-wise
      (9L, None, None, None))
      .toDF("opstamp", "start_ts", "end_ts", "tag")
    val out = DeleteTaskPlanner.partitionByDeletes(
      DeleteTaskPlanner.listStaleSplits(splits, 9L, 1L), tasks)
      .orderBy("split_id")
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_matching_tasks"), r.getString(3)))
    // s-a: task1 (opstamp 3>2, overlap, tag ok) + task3 → 2
    // s-b: task2 time-disjoint; task3 (9>6, match-all) → 1
    // s-c: rangeless split passes any range; null tag passes empty tag set
    //      only via task3's null tag (task1 tag role:tool not present,
    //      task2 opstamp 7 < 8? no, 7 not > 8) → 1
    assert(out(0) == (("s-a", 2L, "delete_and_merge")))
    assert(out(1) == (("s-b", 1L, "delete_and_merge")))
    assert(out(2) == (("s-c", 1L, "delete_and_merge")))
    // boundary: split hi (200) < task start (201) is disjoint → bump only
    val edge = Seq((9L, Some(201L), Some(300L), None: Option[String]))
      .toDF("opstamp", "start_ts", "end_ts", "tag")
    val out2 = DeleteTaskPlanner.partitionByDeletes(
      DeleteTaskPlanner.listStaleSplits(splits, 9L, 1L), edge)
      .filter(col("split_id") === "s-a").collect()
    assert(out2(0).getAs[Long]("n_matching_tasks") == 0L &&
      out2(0).getAs[String]("action") == "bump_opstamp")
  }
}
