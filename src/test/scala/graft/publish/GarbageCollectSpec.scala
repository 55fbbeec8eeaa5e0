package graft.publish

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

/** Janitor GC over the manifest layout: two grace periods, mark → delete,
  * dry-run inertness, batch cap, and referenced files never touched —
  * mirroring garbage_collection.rs's own test matrix (:370-592). */
class GarbageCollectSpec extends AnyFunSuite {

  private val H = 3600L * 1000

  private def setup(): (String, Path, Path) = {
    val dir = Files.createTempDirectory("gc").toString
    val batch = Paths.get(dir, "data", "batch-1")
    Files.createDirectories(batch)
    val live = batch.resolve("part-00000-live.parquet")
    val stale = batch.resolve("part-00001-stale.parquet")
    Files.write(live, Array[Byte](1)); Files.write(stale, Array[Byte](2))
    val store = new Manifest.Store(dir)
    val entry = Manifest.SplitEntry("s1", 0L, 1L, 1L, 0L, 0L, Nil, 0L, 0L, 0,
      0L, Seq(live.toString))
    assert(store.publish(Seq(entry), Set.empty,
      Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("p", -1L, 1L)))).isRight)
    (dir, live, stale)
  }

  private def age(p: Path, now: Long, hours: Long): Unit =
    Files.setLastModifiedTime(p, FileTime.fromMillis(now - hours * H))

  test("stale staged split: marked after staged grace, deleted after deletion grace") {
    val (dir, live, stale) = setup()
    val now = 1_000_000_000_000L
    age(live, now, 100); age(stale, now, 25) // both old; only stale unreferenced
    val r1 = GarbageCollect.run(dir, now)
    assert(r1.marked === Seq(stale.toString) && r1.deleted.isEmpty)
    assert(Files.exists(live) && !Files.exists(stale))
    val marker = Paths.get(stale.toString + ".deleted")
    assert(Files.exists(marker))
    // immediately after marking: deletion grace hasn't passed
    val r2 = GarbageCollect.run(dir, now)
    assert(r2.marked.isEmpty && r2.deleted.isEmpty && Files.exists(marker))
    // 3 h later (grace = 2 h): deleted
    val r3 = GarbageCollect.run(dir, now + 3 * H)
    assert(r3.deleted === Seq(marker.toString) && !Files.exists(marker))
    assert(Files.exists(live)) // referenced file survives every pass
  }

  test("fresh unreferenced files are protected by the staged grace period") {
    val (dir, _, stale) = setup()
    val now = 1_000_000_000_000L
    age(stale, now, 1) // younger than 24 h — may be an in-flight publish
    val r = GarbageCollect.run(dir, now)
    assert(r.marked.isEmpty && Files.exists(stale))
  }

  test("dry run reports candidates and touches nothing") {
    val (dir, _, stale) = setup()
    val now = 1_000_000_000_000L
    age(stale, now, 25)
    val r = GarbageCollect.run(dir, now, dryRun = true)
    assert(r.marked === Seq(stale.toString))
    assert(Files.exists(stale) && !Files.exists(Paths.get(stale.toString + ".deleted")))
  }

  test("deletes at most batchSize marked splits per run (load spreading)") {
    val (dir, _, stale) = setup()
    val now = 1_000_000_000_000L
    val batch = stale.getParent
    val extra = (1 to 4).map { i =>
      val p = batch.resolve(f"part-0000$i-x.parquet.deleted")
      Files.write(p, Array[Byte](i.toByte)); age(p, now, 3); p
    }
    age(stale, now, 25)
    val r = GarbageCollect.run(dir, now, batchSize = 3)
    assert(r.deleted.size === 3 && extra.count(Files.exists(_)) === 1)
    val r2 = GarbageCollect.run(dir, now, batchSize = 3)
    assert(r2.deleted.size === 1) // the remainder drains next run
  }
}
