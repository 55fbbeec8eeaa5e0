package graft.publish

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Janitor garbage collection — the reference's `run_garbage_collect`
  * (quickwit-index-management/src/garbage_collection.rs:86-170; actor
  * quickwit-janitor/src/actors/garbage_collector.rs) over the manifest
  * table layout:
  *
  *  1. data files NOT referenced by the current snapshot (a crashed
  *     publish's stale staged split, or a split replaced by merge /
  *     delete-rewrite / retention) whose mtime is older than
  *     `stagedGrace` are MARKED for deletion — an atomic rename to
  *     `<file>.deleted`, whose own mtime records the mark time (the
  *     metastore `update_timestamp` analog);
  *  2. marked files older than `deletionGrace` are deleted, at most
  *     `batchSize` per run (DELETE_SPLITS_BATCH_SIZE = 1000,
  *     garbage_collection.rs:42 — spreads storage load across runs);
  *  3. `dryRun` reports both candidate sets and touches nothing
  *     (garbage_collection.rs:113-134).
  *
  * Files younger than `stagedGrace` may belong to an in-flight publish and
  * are never touched — the same grace-period reasoning as the reference
  * (garbage_collector.rs:41-43). Referenced files are never candidates.
  */
object GarbageCollect {

  /** 24 h / 2 h: STAGED_GRACE_PERIOD (garbage_collector.rs:43) and
    * DELETION_GRACE_PERIOD (shared_consts.rs). */
  val DefaultStagedGraceMillis: Long = 24L * 3600 * 1000
  val DefaultDeletionGraceMillis: Long = 2L * 3600 * 1000
  val DefaultBatchSize = 1000

  final case class SplitRemovalInfo(marked: Seq[String], deleted: Seq[String])

  def run(tableDir: String, nowMillis: Long,
          stagedGraceMillis: Long = DefaultStagedGraceMillis,
          deletionGraceMillis: Long = DefaultDeletionGraceMillis,
          dryRun: Boolean = false,
          batchSize: Int = DefaultBatchSize): SplitRemovalInfo = {
    val dataDir = Paths.get(tableDir, "data")
    if (!Files.isDirectory(dataDir)) return SplitRemovalInfo(Nil, Nil)
    val live: Set[String] = new Manifest.Store(tableDir).currentSnapshot()
      .map(_.splits.flatMap(_.files).toSet).getOrElse(Set.empty)

    def walk(p: Path): Iterator[Path] =
      if (Files.isDirectory(p)) graft.util.Fs.list(p).iterator.flatMap(walk)
      else Iterator.single(p)

    val all = walk(dataDir).toSeq
    val markCandidates = all.filter { p =>
      val s = p.toString
      s.endsWith(".parquet") && !live.contains(s) &&
        Files.getLastModifiedTime(p).toMillis <= nowMillis - stagedGraceMillis
    }.sortBy(_.toString)
    val deleteCandidates = all.filter { p =>
      p.toString.endsWith(".deleted") &&
        Files.getLastModifiedTime(p).toMillis <= nowMillis - deletionGraceMillis
    }.sortBy(_.toString).take(batchSize)

    if (dryRun)
      return SplitRemovalInfo(markCandidates.map(_.toString),
        deleteCandidates.map(_.toString))

    val marked = markCandidates.map { p =>
      val dst = Paths.get(p.toString + ".deleted")
      Files.move(p, dst, StandardCopyOption.ATOMIC_MOVE)
      // the marker's OWN mtime is the mark timestamp the deletion grace
      // period measures from (rename preserves the source mtime)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(nowMillis))
      p.toString
    }
    val deleted = deleteCandidates.map { p => Files.delete(p); p.toString }
    SplitRemovalInfo(marked, deleted)
  }
}
