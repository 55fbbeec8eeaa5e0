package graft.publish

/** Source checkpoints: per-partition `PartitionId -> Position` maps with
  * delta contiguity enforcement — the exactly-once backbone.
  *
  * Reference: quickwit-metastore/src/checkpoint.rs:37,175,290,401,481 —
  * a delta whose from-position does not equal the current position is
  * rejected (gap or overlap), so a duplicate batch can never publish twice.
  */
object Checkpoint {

  /** Half-open offset range (from, to] per partition, like
    * SourceCheckpointDelta. */
  final case class PartitionDelta(partition: String, fromExclusive: Long, toInclusive: Long) {
    require(toInclusive > fromExclusive, s"empty/negative delta $this")
  }

  final case class Delta(partitions: Seq[PartitionDelta])

  sealed trait IncompatibleReason
  case object Gap extends IncompatibleReason
  case object Overlap extends IncompatibleReason

  final case class SourceCheckpoint(positions: Map[String, Long]) {

    /** checkpoint.rs:290 `check_compatibility`: delta.from must equal the
      * current position for every partition it touches (new partitions start
      * at -1 i.e. "beginning"). */
    def checkCompatibility(delta: Delta): Either[(String, IncompatibleReason), Unit] = {
      delta.partitions.foldLeft[Either[(String, IncompatibleReason), Unit]](Right(())) {
        case (err @ Left(_), _) => err
        case (Right(_), pd) =>
          val cur = positions.getOrElse(pd.partition, -1L)
          if (pd.fromExclusive == cur) Right(())
          else if (pd.fromExclusive > cur) Left((pd.partition, Gap))
          else Left((pd.partition, Overlap))
      }
    }

    /** Apply a compatible delta (fails if incompatible). */
    def tryApply(delta: Delta): Either[(String, IncompatibleReason), SourceCheckpoint] =
      checkCompatibility(delta).map { _ =>
        SourceCheckpoint(positions ++ delta.partitions.map(p => p.partition -> p.toInclusive))
      }
  }

  object SourceCheckpoint {
    val empty: SourceCheckpoint = SourceCheckpoint(Map.empty)
  }
}
