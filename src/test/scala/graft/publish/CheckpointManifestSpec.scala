package graft.publish

import org.scalatest.funsuite.AnyFunSuite
import graft.publish.Checkpoint._
import graft.publish.Manifest._

/** Exactly-once backbone tests — checkpoint contiguity
  * (quickwit-metastore/src/checkpoint.rs:290 check_compatibility) and the
  * atomic publish transaction (publisher.rs:101-150). */
class CheckpointManifestSpec extends AnyFunSuite {

  private def delta(p: String, from: Long, to: Long) =
    Delta(Seq(PartitionDelta(p, from, to)))

  test("delta contiguity: new partition starts at -1") {
    val cp = SourceCheckpoint.empty
    assert(cp.checkCompatibility(delta("p0", -1, 10)).isRight)
    assert(cp.checkCompatibility(delta("p0", 0, 10)) === Left(("p0", Gap)))
  }

  test("delta contiguity: gap and overlap rejected, exact continuation accepted") {
    val cp = SourceCheckpoint(Map("p0" -> 10L))
    assert(cp.checkCompatibility(delta("p0", 10, 20)).isRight)
    assert(cp.checkCompatibility(delta("p0", 15, 20)) === Left(("p0", Gap)))
    assert(cp.checkCompatibility(delta("p0", 5, 20)) === Left(("p0", Overlap)))
    assert(cp.checkCompatibility(delta("p0", -1, 20)) === Left(("p0", Overlap))) // replay
  }

  test("tryApply advances positions; multi-partition deltas are all-or-nothing") {
    val cp = SourceCheckpoint(Map("p0" -> 10L, "p1" -> 5L))
    val ok = Delta(Seq(PartitionDelta("p0", 10, 20), PartitionDelta("p1", 5, 8)))
    assert(cp.tryApply(ok) === Right(SourceCheckpoint(Map("p0" -> 20L, "p1" -> 8L))))
    val bad = Delta(Seq(PartitionDelta("p0", 10, 20), PartitionDelta("p1", 6, 8)))
    assert(cp.tryApply(bad).isLeft)
  }

  test("empty/negative deltas are invalid") {
    intercept[IllegalArgumentException](PartitionDelta("p0", 10, 10))
    intercept[IllegalArgumentException](PartitionDelta("p0", 10, 5))
  }

  private def entry(id: String, docs: Long = 100L) = SplitEntry(
    splitId = id, partitionId = 1L, numDocs = docs, uncompressedBytes = docs * 50,
    timeRangeStartMicros = 1000L, timeRangeEndMicros = 2000L,
    tags = Seq("bash", "sql"), termCardinality = 42L, postingsCount = 314L,
    numMergeOps = 0, deleteOpstamp = 0L, files = Seq("f1.parquet"))

  test("manifest publish: accumulates splits, advances checkpoint, bumps snapshot id") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val store = new Store(dir)
    assert(store.currentSnapshot() === None)

    val s1 = store.publish(Seq(entry("a")), Set.empty, delta("src", -1, 100))
    assert(s1.map(_.snapshotId) === Right(1L))
    val s2 = store.publish(Seq(entry("b")), Set.empty, delta("src", 100, 200))
    assert(s2.map(_.snapshotId) === Right(2L))
    val snap = store.currentSnapshot().get
    assert(snap.splits.map(_.splitId).toSet === Set("a", "b"))
    assert(snap.checkpoint === Map("src" -> 200L))
  }

  test("manifest publish: duplicate delta rejected (exactly-once), gap rejected") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val store = new Store(dir)
    assert(store.publish(Seq(entry("a")), Set.empty, delta("src", -1, 100)).isRight)
    assert(store.publish(Seq(entry("a2")), Set.empty, delta("src", -1, 100)).isLeft)
    assert(store.publish(Seq(entry("a3")), Set.empty, delta("src", 150, 300)).isLeft)
    // state unchanged after rejections
    assert(store.currentSnapshot().get.splits.map(_.splitId) === Seq("a"))
  }

  test("manifest publish: replaced split ids are dropped (merge path)") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val store = new Store(dir)
    store.publish(Seq(entry("a"), entry("b")), Set.empty, delta("src", -1, 100))
    store.publish(Seq(entry("merged", 200L)), Set("a", "b"), delta("src", 100, 200))
    assert(store.currentSnapshot().get.splits.map(_.splitId) === Seq("merged"))
  }

  test("commit race: interleaved writers from the same base — exactly one CAS wins") {
    // TRUE interleave (ADVICE r1): both writers read the same base snapshot
    // BEFORE either commits, then race the commit itself. The hard-link CAS
    // must let exactly one snapshot-2 land and surface a Left to the loser
    // (a rename-based commit silently replaces the winner's file on POSIX).
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val a = new Store(dir); val b = new Store(dir)
    a.publish(Seq(entry("base")), Set.empty, delta("src", -1, 100))
    val base = a.currentSnapshot().get
    // both writers computed their next snapshot from the SAME base
    val snapA = Snapshot(base.snapshotId + 1, base.splits :+ entry("a2"), Map("src" -> 200L))
    val snapB = Snapshot(base.snapshotId + 1, base.splits :+ entry("b2"), Map("src" -> 200L))
    val ra = a.commitSnapshot(snapA)
    val rb = b.commitSnapshot(snapB)
    assert(ra.isRight && rb.isLeft)
    // the surviving snapshot is the WINNER's, byte-for-byte — not the loser's
    assert(a.currentSnapshot().get.splits.map(_.splitId) === Seq("base", "a2"))
    assert(b.currentSnapshot().get.splits.map(_.splitId) === Seq("base", "a2"))
  }

  test("commit race under real concurrency: N threads, no lost update") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val n = 8
    val gate = new java.util.concurrent.CyclicBarrier(n)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        val s = new Store(dir) // one store per "process" — no shared lock
        gate.await()
        var published = false
        var attempts = 0
        while (!published && attempts < n + 2) {
          // optimistic retry from the freshest snapshot, like a real indexer
          val from = s.currentSnapshot().map(_.checkpoint("src")).getOrElse(-1L)
          s.publish(Seq(entry(s"t$i-$attempts")), Set.empty,
            delta("src", from, from + 100)) match {
            case Right(_) => published = true
            case Left(_)  => attempts += 1
          }
        }
        results.add(published)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.size === n && !results.contains(false))
    val finalSnap = new Store(dir).currentSnapshot().get
    // every thread's batch landed exactly once; checkpoint advanced n×100
    assert(finalSnap.splits.size === n)
    assert(finalSnap.checkpoint === Map("src" -> (n * 100L - 1L))) // -1 + 8×100
  }

  test("crash before publish: staged data invisible, rerun of the delta succeeds") {
    // crash-safety: sink files staged but publish never ran → snapshot is
    // unchanged; rerunning the same batch publishes normally (staged files
    // are orphans for GC, never visible state)
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    val store = new Store(dir)
    store.publish(Seq(entry("a")), Set.empty, delta("src", -1, 100))
    // "crash": nothing published for delta 100..200 — state still at 100
    assert(store.currentSnapshot().get.checkpoint === Map("src" -> 100L))
    // rerun the batch end-to-end: succeeds exactly once
    assert(store.publish(Seq(entry("b")), Set.empty, delta("src", 100, 200)).isRight)
    assert(store.publish(Seq(entry("b_dup")), Set.empty, delta("src", 100, 200)).isLeft)
  }

  test("snapshot JSON round-trip is exact") {
    val snap = Snapshot(7L, Seq(entry("x\"esc\n", 5L)), Map("p0" -> 10L, "p1" -> 20L))
    assert(Manifest.fromJson(Manifest.toJson(snap)) === snap)
  }

  test("field_ranges round-trip exactly, including i64 beyond 2^53") {
    // a Double-routed parse would round 1000000000000000003 down and make
    // generalized split skipping lossy; bounds travel as strings
    val big = entry("r", 5L).copy(fieldRanges = Map(
      "turn_idx" -> (0L, 42L),
      "hash_id" -> (-1000000000000000003L, 1000000000000000003L)))
    val snap = Snapshot(1L, Seq(big), Map.empty)
    assert(Manifest.fromJson(Manifest.toJson(snap)) === snap)
    // pre-r4 snapshots (no field_ranges key) read back rangeless
    val legacy = Manifest.toJson(snap).replaceAll(""""field_ranges":\{[^}]*\},""", "")
    assert(Manifest.fromJson(legacy).splits.head.fieldRanges === Map.empty)
  }
}
