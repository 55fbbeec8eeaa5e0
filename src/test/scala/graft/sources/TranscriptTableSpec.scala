package graft.sources

import graft.SparkTestBase
import graft.model.TranscriptGen
import graft.publish.Checkpoint

/** Iceberg-layout table tests: append/publish, metadata time pruning
  * (the list_relevant_splits analog, root.rs:1037-1052), count fast path. */
class TranscriptTableSpec extends SparkTestBase {

  private def delta(from: Long, to: Long) =
    Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("src", from, to)))

  test("append publishes per-file stats; scan reads everything back") {
    import spark.implicits._
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 20, avgTurns = 5)
    table.append(turns.toDS().toDF(), delta(-1, 100), numFiles = 3)
    assert(table.scan().count() === turns.size.toLong)
    assert(table.countFromMetadata() === turns.size.toLong)
    val snap = table.store.currentSnapshot().get
    assert(snap.splits.nonEmpty && snap.splits.forall(_.numDocs > 0))
  }

  test("metadata time pruning skips disjoint file groups") {
    import spark.implicits._
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 30, avgTurns = 6)
    table.append(turns.toDS().toDF(), delta(-1, 100), numFiles = 4)
    val micros = turns.map(_.ts.getTime * 1000L)
    val (lo, hi) = (micros.min, micros.max)
    // full-range scan sees all rows
    assert(table.scan(Some(lo), Some(hi + 1)).count() === turns.size.toLong)
    // a range beyond max prunes everything without touching data files
    assert(table.scan(Some(hi + 1000000L), None).count() === 0L)
    // a narrow range returns at least the rows in range (pruning is
    // file-granular, never lossy)
    val mid = (lo + hi) / 2
    val expect = micros.count(_ >= mid).toLong
    assert(table.scan(Some(mid), None).count() >= expect)
  }

  test("duplicate append delta is rejected by the manifest store") {
    import spark.implicits._
    val dir = tmpDir("ttable")
    val table = new TranscriptTable(dir, spark)
    val turns = TranscriptGen.turns(numConvs = 5, avgTurns = 4)
    table.append(turns.toDS().toDF(), delta(-1, 50))
    intercept[IllegalStateException] {
      table.append(turns.toDS().toDF(), delta(-1, 50))
    }
  }
}
