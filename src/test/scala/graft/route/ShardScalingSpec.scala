package graft.route

import graft.route.ShardScaling._
import org.scalatest.funsuite.AnyFunSuite

/** Pins shard autoscaling on the reference's own tests:
  * ingest_controller.rs test_find_scale_down_candidate (:1563-1684),
  * try_scale_up/down permit behavior, shard_table.rs:830 avg-rate golden,
  * and rate_limiter.rs:150-180 token-bucket goldens. */
class ShardScalingSpec extends AnyFunSuite {

  private def clock(start: Long = 0L): (() => Long, Long => Unit) = {
    var t = start
    (() => t, (nt: Long) => t = nt)
  }

  test("find_scale_down_candidate golden (ingest_controller.rs:1563-1684)") {
    // ingester-0: open shards 1 (rate 1), 2 (rate 2); shard 3 closed.
    // ingester-1: open shards 4/5/6 (rates 4/5/6).
    val shards = Seq(
      ShardEntry("shard-1", "test-ingester-0", open = true, 1),
      ShardEntry("shard-2", "test-ingester-0", open = true, 2),
      ShardEntry("shard-3", "test-ingester-0", open = false, 3),
      ShardEntry("shard-4", "test-ingester-1", open = true, 4),
      ShardEntry("shard-5", "test-ingester-1", open = true, 5),
      ShardEntry("shard-6", "test-ingester-1", open = true, 6))
    // fewest open shards → ingester-0; its highest-(rate, id) shard → 2
    assert(findScaleDownCandidate(shards).contains(("test-ingester-0", "shard-2")))
    assert(findScaleDownCandidate(Nil).isEmpty)
  }

  test("shard stats average over OPEN shards only (shard_table.rs:406-427,830)") {
    val s = shardStats(Seq(
      ShardEntry("a", "l", open = true, 1),
      ShardEntry("b", "l", open = true, 2),
      ShardEntry("c", "l", open = false, 100)))
    assert(s.numOpenShards == 2 && s.avgIngestionRate == 1.5f)
    assert(shardStats(Nil) == ShardStats(0, 0.0f))
  }

  test("decide: thresholds 4 / 1 MiB/s, >1 shard for scale-down, limiter gating") {
    val (now, _) = clock()
    val up = scalingUpLimiter(now); val down = scalingDownLimiter(now)
    def open(rates: Int*): Seq[ShardEntry] =
      rates.zipWithIndex.map { case (r, i) => ShardEntry(s"s$i", s"l${i % 2}", open = true, r) }
    assert(decide(open(4, 4), up, down) == ScaleUp(3))
    assert(decide(open(2, 2), up, down) == Hold) // between thresholds
    // avg ≤ 1 with one shard: no scale-down below 2 shards
    assert(decide(open(0), up, down) == Hold)
    val d = decide(open(0, 1), up, down)
    assert(d.isInstanceOf[ScaleDown])
    // scale-down burst is 1/min: a second decision in the same instant holds
    assert(decide(open(0, 1), up, down) == Hold)
  }

  test("rate limiter: burst, refill catch-up over multiple periods (rate_limiter.rs goldens)") {
    // reference test_rate_limiter_acquire shape: burst 2000, 100/period
    val (now, set) = clock()
    val rl = new RateLimiter(2000L, 100L, 100_000L, now)
    assert(rl.acquire(1000L) && rl.acquire(1000L) && !rl.acquire(1L))
    set(200_000L) // one full period past refill_at (refill_at was 100_000)
    // elapsed = 100_000 → refill = 100 + 100*1 = 200
    assert(rl.acquire(200L) && !rl.acquire(20L))
    // scaling-up limiter: 5 immediate permits, then empty until 12 s pass
    val (n2, s2) = clock()
    val up = scalingUpLimiter(n2)
    assert((1 to 5).forall(_ => up.acquire(1L)) && !up.acquire(1L))
    s2(12_000_000L * 2) // refill catches up
    assert(up.acquire(1L))
    // release never exceeds the burst cap
    up.release(100L)
    assert(up.availablePermits <= 5L)
  }
}
