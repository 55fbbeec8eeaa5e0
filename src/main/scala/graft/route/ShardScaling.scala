package graft.route

/** Ingest-v2 shard autoscaling — the control-plane loop that watches
  * per-shard ingestion rates and opens/closes shards
  * (quickwit-control-plane/src/ingest/ingest_controller.rs:51-59,294-318,
  * 506-641 and model/shard_table.rs:34-48,406-515), plus the token-bucket
  * rate limiter that damps scaling flapping
  * (quickwit-common/src/rate_limiter.rs:39-147).
  *
  * In the Spark rebuild the "shards" of a source are its routed partitions
  * ([[Routing]]); this module supplies the reference's CONTROL decisions —
  * when to widen or narrow the partition fan-out of a streaming source —
  * as pure, clock-injected logic the streaming driver can run per
  * micro-batch. Thresholds are the reference's: a shard sustains 5 MiB/s;
  * scale up at 80% (4 MiB/s average), scale down at 20% (1 MiB/s) with
  * more than one open shard; scale-ups are limited to 5/min (burst 5,
  * refill every 12 s), scale-downs to 1/min.
  */
object ShardScaling {

  /** ingest_controller.rs:51-59. */
  val MaxShardThroughputMiBps: Float = 5.0f
  val ScaleUpThresholdMiBps: Float = MaxShardThroughputMiBps * 8 / 10
  val ScaleDownThresholdMiBps: Float = MaxShardThroughputMiBps * 2 / 10

  /** Token bucket with burst credits (rate_limiter.rs:39-147): starts full
    * at `burstLimit`, refills `refillAmount` per `refillPeriodMicros`
    * (catching up over multiple elapsed periods), capped at the burst
    * limit. The clock is injected for determinism. */
  final class RateLimiter(burstLimit: Long, refillAmount: Long,
                          refillPeriodMicros: Long, now: () => Long) {
    private var available = burstLimit
    private var refillAt = now() + refillPeriodMicros

    def availablePermits: Long = available

    def acquire(numPermits: Long): Boolean =
      acquireInner(numPermits) || { refill(now()); acquireInner(numPermits) }

    def release(numPermits: Long): Unit =
      available = math.min(burstLimit, available + numPermits)

    private def acquireInner(n: Long): Boolean =
      available >= n && { available -= n; true }

    private def refill(nowMicros: Long): Unit = {
      if (nowMicros < refillAt) return
      val elapsed = nowMicros - refillAt
      // more than one refill period may have elapsed (rate_limiter.rs:137-143)
      val refill = refillAmount + refillAmount * elapsed / refillPeriodMicros
      available = math.min(burstLimit, available + refill)
      refillAt = nowMicros + refillPeriodMicros
    }
  }

  /** SCALING_UP_RATE_LIMITER_SETTINGS (shard_table.rs:34-38): burst 5,
    * 5/min, refill every 12 s. */
  def scalingUpLimiter(now: () => Long): RateLimiter =
    new RateLimiter(5L, 1L, 12_000_000L, now)

  /** SCALING_DOWN_RATE_LIMITER_SETTINGS (shard_table.rs:40-45): burst 1,
    * 1/min. */
  def scalingDownLimiter(now: () => Long): RateLimiter =
    new RateLimiter(1L, 1L, 60_000_000L, now)

  final case class ShardEntry(shardId: String, leaderId: String,
                              open: Boolean, ingestionRateMiBps: Int)

  /** shard_table.rs:406-427: averages over OPEN shards only. */
  final case class ShardStats(numOpenShards: Int, avgIngestionRate: Float)
  def shardStats(shards: Seq[ShardEntry]): ShardStats = {
    val open = shards.filter(_.open)
    ShardStats(open.size,
      if (open.isEmpty) 0.0f else open.map(_.ingestionRateMiBps).sum.toFloat / open.size)
  }

  /** find_scale_down_candidate (ingest_controller.rs:643-674): per leader,
    * the open shard with the HIGHEST (rate, shardId); then the leader with
    * the FEWEST open shards. The reference's leader tie is HashMap-order
    * arbitrary; we break it by leaderId for determinism. */
  def findScaleDownCandidate(shards: Seq[ShardEntry]): Option[(String, String)] = {
    val perLeader = shards.filter(_.open).groupBy(_.leaderId).map {
      case (leader, ss) =>
        val candidate = ss.maxBy(s => (s.ingestionRateMiBps, s.shardId))
        (leader, ss.size, candidate)
    }
    if (perLeader.isEmpty) None
    else {
      val (leader, _, shard) = perLeader.minBy { case (l, n, _) => (n, l) }
      Some((leader, shard.shardId))
    }
  }

  sealed trait Decision
  final case class ScaleUp(newNumOpenShards: Int) extends Decision
  final case class ScaleDown(leaderId: String, shardId: String) extends Decision
  case object Hold extends Decision

  /** handle_local_shards_update (ingest_controller.rs:294-318) +
    * the permit acquisition of try_scale_up/down (:506-521, :585-612):
    * scale up at avg ≥ 4 MiB/s, scale down at avg ≤ 1 MiB/s with > 1 open
    * shard, both gated by their rate limiters; a missing scale-down
    * candidate releases the permit (as the reference does on failure). */
  def decide(shards: Seq[ShardEntry], up: RateLimiter, down: RateLimiter): Decision = {
    val stats = shardStats(shards)
    if (stats.avgIngestionRate >= ScaleUpThresholdMiBps) {
      if (up.acquire(1L)) ScaleUp(stats.numOpenShards + 1) else Hold
    } else if (stats.avgIngestionRate <= ScaleDownThresholdMiBps && stats.numOpenShards > 1) {
      if (!down.acquire(1L)) Hold
      else findScaleDownCandidate(shards) match {
        case Some((leader, shard)) => ScaleDown(leader, shard)
        case None => down.release(1L); Hold
      }
    } else Hold
  }
}
