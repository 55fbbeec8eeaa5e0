package graft.publish

import graft.SparkTestBase
import graft.model.TranscriptGen
import graft.queryast.QueryAst
import graft.sources.TranscriptTable
import org.apache.spark.sql.functions._

/** One janitor cycle: retention → deletes → merges → GC, idempotent on
  * rerun (retention_policy_executor.rs run_policy; janitor wiring). */
class JanitorSpec extends SparkTestBase {

  private def delta(from: Long, to: Long) =
    Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("src", from, to)))

  test("retention never drops the no-timestamp sentinel split") {
    import spark.implicits._
    val dir = tmpDir("janitor-sentinel")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 5, avgTurns = 4)
    // a batch whose ts are ALL NULL records the 0L sentinel time range
    val nullTs = turns.toDS().toDF()
      .withColumn("ts", lit(null).cast("timestamp"))
    table.append(nullTs, delta(-1, 1), numFiles = 1)
    val s = table.store.currentSnapshot().get.splits.head
    assert(s.timeRangeEndMicros === 0L)
    // any positive cutoff would have matched end < cutoff — it must not
    assert(RetentionExecutor.run(dir, cutoffMicros = Long.MaxValue) === Nil)
    assert(table.scan().count() === turns.size.toLong)
  }

  test("full cycle: expired splits drop, deletes apply, survivors merge, GC reaps") {
    import spark.implicits._
    val dir = tmpDir("janitor")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 40, avgTurns = 5)
    val df = turns.toDS().toDF()
    val micros = turns.map(_.ts.getTime * 1000L).sorted
    val cutoff = micros(micros.size / 4) // oldest quarter expires
    // one old split wholly before the cutoff + 8 hash-keyed recent splits
    table.append(df.filter(unix_micros(col("ts")) < cutoff), delta(-1, 1), numFiles = 1)
    (0 until 8).foreach { i =>
      table.append(
        df.filter(unix_micros(col("ts")) >= cutoff &&
          pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(8L)) === i.toLong),
        delta(i + 1, i + 2), numFiles = 1)
    }
    val cfg = MergePolicy.Config(mergeFactor = 3, maxMergeFactor = 4,
      minLevelNumDocs = 1000000L, splitNumDocsTarget = 40L)
    val tasks = Seq(DeleteExecutor.DeleteTask(5L, QueryAst.Term("role", "tool")))

    val now = System.currentTimeMillis() + GarbageCollect.DefaultStagedGraceMillis + 1000
    val rep = Janitor.cycle(dir, spark, cfg, tasks, Some(cutoff), nowMillis = now)
    assert(rep.retentionDropped.size === 1)
    assert(rep.deleteRewritten + rep.deleteBumped === 8)
    assert(rep.merged >= 1)
    // GC marked every file the stages unreferenced (old split + delete and
    // merge inputs); live data still answers exactly
    assert(rep.gc.marked.nonEmpty)
    val want = turns.filter(t => t.ts.getTime * 1000L >= cutoff && t.role != "tool")
    assert(table.scan().count() === want.size.toLong)
    val snap = table.store.currentSnapshot().get
    assert(snap.splits.forall(_.deleteOpstamp === 5L))

    // rerun with the same inputs: a complete no-op (idempotent cycle)
    val rep2 = Janitor.cycle(dir, spark, cfg, tasks, Some(cutoff),
      nowMillis = now + GarbageCollect.DefaultDeletionGraceMillis + 1000)
    assert(rep2.retentionDropped.isEmpty && rep2.deleteRewritten === 0 &&
      rep2.deleteBumped === 0 && rep2.merged === 0)
    // GC may mark intermediates that went stale DURING cycle 1 (their
    // mtimes postdate cycle 1's cutoff) — but never a live file
    val live = table.store.currentSnapshot().get.splits.flatMap(_.files).toSet
    assert(rep2.gc.marked.forall(f => !live.contains(f)))
    assert(table.scan().count() === want.size.toLong)
  }
}
