package graft.publish

import graft.SparkTestBase
import graft.model.TranscriptGen
import graft.sources.TranscriptTable
import org.apache.spark.sql.functions._

/** Physical merge execution (merge_executor.rs:184-463,
  * merge_pipeline.rs:45-61): content preservation, atomic
  * staged+replaced publish, crash-mid-merge recovery, GC of replaced
  * files, idempotent reruns. */
class MergeExecutorSpec extends SparkTestBase {

  private def delta(from: Long, to: Long) =
    Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("src", from, to)))

  // ~16-doc input splits are immature; a 4-way merge (~65 docs) crosses
  // split_num_docs_target and becomes MATURE — the policy's own stopping
  // rule, so a re-run finds nothing to merge (stable_log_merge_policy.rs
  // maturity gate).
  private val cfg = MergePolicy.Config(mergeFactor = 3, maxMergeFactor = 4,
    minLevelNumDocs = 1000000L, splitNumDocsTarget = 40L)

  /** 12 single-file splits over residue classes of ts µs. */
  private def buildTable(dir: String): TranscriptTable = {
    import spark.implicits._
    val table = new TranscriptTable(dir, spark)
    val df = TranscriptGen.turns(numConvs = 40, avgTurns = 5).toDS().toDF()
    (0 until 12).foreach { i =>
      // hash-keyed classes: whole-second ts values make µs residues collide
      table.append(
        df.filter(pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(12L)) === i.toLong),
        delta(i - 1, i), numFiles = 1)
    }
    table
  }

  private def content(table: TranscriptTable): Seq[String] =
    table.scan().orderBy("conv_id", "turn_idx")
      .collect().map(_.toString).toSeq

  test("merge executes the plan: content preserved, split count reduced, metadata combined") {
    val dir = tmpDir("merge-exec")
    val table = buildTable(dir)
    val before = content(table)
    val snapBefore = table.store.currentSnapshot().get
    assert(snapBefore.splits.size === 12)
    val plan = MergePolicy.planMerges(snapBefore.splits, cfg)
    assert(plan.size === 3 && plan.forall(_.size === 4))

    val res = MergeExecutor.run(dir, spark, cfg)
    assert(res.merged.size === 3 && res.skipped === 0)
    assert(res.replacedIds.size === 12)

    val snapAfter = table.store.currentSnapshot().get
    assert(snapAfter.splits.size === 3)
    assert(snapAfter.splits.map(_.splitId).toSet ===
      plan.map(MergeExecutor.mergedSplitId).toSet)
    // checkpoint positions untouched by the merge publish (empty delta)
    assert(snapAfter.checkpoint === snapBefore.checkpoint)
    // metadata combine: totals preserved, merge-op generation incremented
    assert(snapAfter.splits.map(_.numDocs).sum === snapBefore.splits.map(_.numDocs).sum)
    assert(snapAfter.splits.map(_.uncompressedBytes).sum ===
      snapBefore.splits.map(_.uncompressedBytes).sum)
    assert(snapAfter.splits.forall(_.numMergeOps === 1))
    assert(snapAfter.splits.map(_.timeRangeStartMicros).min ===
      snapBefore.splits.map(_.timeRangeStartMicros).min)
    assert(snapAfter.splits.map(_.timeRangeEndMicros).max ===
      snapBefore.splits.map(_.timeRangeEndMicros).max)
    // the merged table serves EXACTLY the same rows
    assert(content(table) === before)
    // merged splits are single sorted file groups under data/merge-*
    assert(snapAfter.splits.forall(s =>
      s.files.size === 1 && s.files.head.contains("/data/merge-")))

    // a second run finds nothing to merge (3 < merge_factor... per level)
    val res2 = MergeExecutor.run(dir, spark, cfg)
    assert(res2.merged.isEmpty)
    assert(content(table) === before)
  }

  test("crash between stage and publish: old snapshot readable, rerun converges") {
    val dir = tmpDir("merge-crash")
    val table = buildTable(dir)
    val before = content(table)
    val snap0 = table.store.currentSnapshot().get
    val plan = MergePolicy.planMerges(snap0.splits, cfg)

    // "crash": stage the first batch's files but never publish
    val staged = MergeExecutor.stageBatch(dir, spark, plan.head)
    assert(staged.files.nonEmpty)
    // the manifest did not move — readers see the old splits, same rows
    assert(table.store.currentSnapshot().get.snapshotId === snap0.snapshotId)
    assert(content(table) === before)

    // rerun from scratch: the deterministic merged id makes the retry
    // overwrite the SAME staged dir, publish once, and converge
    val res = MergeExecutor.run(dir, spark, cfg)
    assert(res.merged.size === plan.size)
    assert(res.merged.map(_.splitId).contains(staged.splitId))
    assert(content(table) === before)
    assert(table.store.currentSnapshot().get.splits.size === plan.size)
  }

  test("GC reaps replaced files after the grace periods; merged files survive") {
    val dir = tmpDir("merge-gc")
    val table = buildTable(dir)
    val replacedFiles = table.store.currentSnapshot().get.splits.flatMap(_.files)
    MergeExecutor.run(dir, spark, cfg)
    val mergedFiles = table.store.currentSnapshot().get.splits.flatMap(_.files)

    val now = System.currentTimeMillis()
    // within the staged grace: nothing is touched
    val early = GarbageCollect.run(dir, now, dryRun = true)
    assert(early.marked.isEmpty && early.deleted.isEmpty)
    // past the staged grace: exactly the replaced files are marked
    val afterGrace = now + GarbageCollect.DefaultStagedGraceMillis + 1000
    val marked = GarbageCollect.run(dir, afterGrace)
    assert(marked.marked.toSet === replacedFiles.toSet)
    // past the deletion grace: the markers are deleted; merged files stay
    val afterDeletion = afterGrace + GarbageCollect.DefaultDeletionGraceMillis + 1000
    val deleted = GarbageCollect.run(dir, afterDeletion)
    assert(deleted.deleted.toSet === replacedFiles.map(_ + ".deleted").toSet)
    mergedFiles.foreach(f => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f))))
    // and the table still serves every row from the merged splits alone
    assert(table.scan().count() === table.countFromMetadata())
  }

  test("publish rejects a duplicate staged split id") {
    val dir = tmpDir("merge-dup")
    val table = buildTable(dir)
    val snap = table.store.currentSnapshot().get
    val clash = snap.splits.head.copy(files = Nil)
    val got = table.store.publish(Seq(clash), Set.empty, Checkpoint.Delta(Nil))
    assert(got.isLeft && got.swap.exists(_.contains("already published")))
  }
}
