package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Ingest API v1 queues (S4) — the reference keeps one write-ahead record
  * log per index with monotonically increasing positions; the indexing
  * source tails it from its checkpoint and, after a successful publish, the
  * publisher *suggests truncation* up to the committed position
  * (quickwit-ingest/src/queue.rs:53-200 create_queue/fetch/suggest_truncate;
  * truncation trigger quickwit-indexing/src/actors/publisher.rs:155-170).
  *
  * File-backed batch analog: one directory per queue, one JSON-lines
  * segment file per appended batch named `seg-<startPos>-<endPos>`.
  * Truncation is segment-granular, exactly like the reference's mrecordlog
  * (a segment is deleted only once its WHOLE range is ≤ the truncate
  * position — positions are never reused). */
final class IngestQueue(rootDir: String) {

  private def queueDir(queueId: String): Path = Paths.get(rootDir, queueId)

  private val SegName = "seg-([0-9]+)-([0-9]+)".r

  private def segments(queueId: String): Seq[(Long, Long, Path)] = {
    val dir = queueDir(queueId)
    if (!Files.isDirectory(dir)) Seq.empty
    else graft.util.Fs.list(dir).iterator.flatMap { p =>
      p.getFileName.toString match {
        case SegName(from, to) => Some((from.toLong, to.toLong, p))
        case _                 => None
      }
    }.toSeq.sortBy(_._1)
  }

  def createQueue(queueId: String): Unit =
    Files.createDirectories(queueDir(queueId))

  def queueExists(queueId: String): Boolean = Files.isDirectory(queueDir(queueId))

  /** Positions are NEVER reused, even when truncation removes every
    * segment: a `_position` marker persists the floor (written after each
    * append — a crash between segment write and marker is covered by the
    * max() with the surviving segments). */
  private def positionFloor(queueId: String): Long = {
    val marker = queueDir(queueId).resolve("_position")
    if (Files.exists(marker))
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def writeFloor(queueId: String, pos: Long): Unit =
    Files.write(queueDir(queueId).resolve("_position"),
      pos.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  /** Next position to be assigned (= last end position + 1, 0 when empty). */
  def endPosition(queueId: String): Long =
    math.max(segments(queueId).lastOption.map(_._2 + 1).getOrElse(0L),
             positionFloor(queueId))

  /** Segment ranges (from, to) in position order — failover resync replays
    * the WAL segment-by-segment so each file is read exactly once and the
    * replica reproduces the leader's original batch granularity. */
  private[sources] def segmentRanges(queueId: String): Seq[(Long, Long)] =
    segments(queueId).map { case (from, to, _) => (from, to) }

  /** Replica bootstrap: advance an EMPTY queue's position floor so its next
    * ingest is assigned `nextPosition` — positions are global per shard, so
    * a replica opened mid-stream must take over the leader's numbering (the
    * reference's replica stream starts from the replication checkpoint, not
    * zero). Rejected on a non-empty queue or a rewind: positions are never
    * reused. */
  def alignFloor(queueId: String, nextPosition: Long): Unit = {
    require(queueExists(queueId), s"queue $queueId does not exist")
    require(segments(queueId).isEmpty,
      s"cannot align the floor of non-empty queue $queueId")
    require(nextPosition >= positionFloor(queueId),
      s"position floor never rewinds: $queueId at ${positionFloor(queueId)}, asked $nextPosition")
    writeFloor(queueId, nextPosition)
  }

  /** Append a batch of docs; returns the (first, last) positions assigned.
    * Positions are contiguous and never reused, even across truncation. */
  def ingest(queueId: String, docs: Seq[String]): (Long, Long) = {
    require(docs.nonEmpty, "empty ingest batch")
    require(queueExists(queueId), s"queue $queueId does not exist")
    val from = endPosition(queueId)
    val to = from + docs.length - 1
    val tmp = queueDir(queueId).resolve(s".seg-$from-$to.tmp")
    Files.write(tmp, docs.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, queueDir(queueId).resolve(s"seg-$from-$to"))
    writeFloor(queueId, to + 1)
    (from, to)
  }

  /** Fetch up to `maxDocs` records with position > `afterPosition` (the
    * checkpoint-tail read of the indexing source). Returns (position, doc)
    * pairs in position order. */
  def fetch(queueId: String, afterPosition: Long, maxDocs: Int): Seq[(Long, String)] =
    segments(queueId).iterator
      .filter { case (_, to, _) => to > afterPosition }
      .flatMap { case (from, _, p) =>
        Files.readAllLines(p, StandardCharsets.UTF_8).asScala.zipWithIndex
          .map { case (doc, i) => (from + i, doc) }
      }
      .filter(_._1 > afterPosition)
      .take(maxDocs)
      .toSeq

  /** suggest_truncate: drop every segment whose entire range is ≤
    * `upToInclusive` (the position just published to the metastore).
    * Returns the number of segments removed. */
  def suggestTruncate(queueId: String, upToInclusive: Long): Int = {
    val doomed = segments(queueId).filter { case (_, to, _) => to <= upToInclusive }
    doomed.foreach { case (_, _, p) => Files.deleteIfExists(p) }
    doomed.size
  }
}
