package graft.publish

import org.apache.spark.sql.SparkSession

/** Physical retention enforcement — the janitor's retention-policy
  * executor (quickwit-janitor/src/actors/retention_policy_executor.rs:
  * 108-149 `run_policy`): a split whose WHOLE time range ended before the
  * cutoff is dropped from the manifest in one atomic publish (files
  * become GC food). Split-granular like the reference — rows inside a
  * surviving split older than the cutoff stay until a later split rolls
  * past it, which is the documented retention contract. */
object RetentionExecutor {
  def run(tableDir: String, cutoffMicros: Long): Seq[String] = {
    val store = new Manifest.Store(tableDir)
    val snap = store.currentSnapshot().getOrElse(return Nil)
    // 0L is the NO-TIMESTAMP sentinel (an all-null-ts batch): a split
    // without a time range is never retention-eligible, exactly as the
    // reference skips splits lacking one — dropping it would destroy
    // rows that carry no event time at all
    val expired = snap.splits
      .filter(s => s.timeRangeEndMicros > 0L && s.timeRangeEndMicros < cutoffMicros)
      .map(_.splitId)
    if (expired.isEmpty) Nil
    else store.publish(Nil, expired.toSet, Checkpoint.Delta(Nil)) match {
      case Right(_) => expired
      case Left(_)  => Nil // lost a CAS race; the next cycle converges
    }
  }
}

/** One janitor maintenance cycle over a table — the standing loop the
  * reference distributes across its janitor actors (retention, delete
  * tasks, GC) and the indexing service's merge pipeline
  * (quickwit-janitor/src/lib.rs janitor service wiring;
  * merge_pipeline.rs:45-61). Order matters and mirrors the cheapest-first
  * reasoning: retention drops whole splits before deletes scan them,
  * deletes rewrite before merges coalesce the survivors, GC reaps
  * everything the earlier stages unreferenced. Every stage is
  * individually idempotent, so the CYCLE is idempotent: a rerun with the
  * same inputs is a no-op report. */
object Janitor {

  final case class CycleReport(
      retentionDropped: Seq[String],
      deleteRewritten: Int, deleteBumped: Int, deletedDocs: Long,
      merged: Int,
      gc: GarbageCollect.SplitRemovalInfo)

  def cycle(tableDir: String, spark: SparkSession,
            mergeCfg: MergePolicy.Config = MergePolicy.Config(),
            deleteTasks: Seq[DeleteExecutor.DeleteTask] = Nil,
            retentionCutoffMicros: Option[Long] = None,
            nowMillis: Long = System.currentTimeMillis(),
            stagedGraceMillis: Long = GarbageCollect.DefaultStagedGraceMillis,
            deletionGraceMillis: Long = GarbageCollect.DefaultDeletionGraceMillis): CycleReport = {
    val dropped = retentionCutoffMicros
      .map(RetentionExecutor.run(tableDir, _)).getOrElse(Nil)
    val del =
      if (deleteTasks.isEmpty) DeleteExecutor.Result(Nil, Nil, 0L)
      else DeleteExecutor.run(tableDir, spark, deleteTasks)
    val mer = MergeExecutor.run(tableDir, spark, mergeCfg)
    val gc = GarbageCollect.run(tableDir, nowMillis,
      stagedGraceMillis = stagedGraceMillis,
      deletionGraceMillis = deletionGraceMillis)
    CycleReport(dropped, del.rewritten.size, del.bumped.size, del.deletedDocs,
      mer.merged.size, gc)
  }
}
