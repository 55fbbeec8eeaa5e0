package graft.route

import scala.collection.immutable.SortedMap

/** Control-plane shard-to-indexer placement — the scheduler that turns
  * (source shard counts, per-shard cpu loads, indexer cpu capacities) into
  * per-indexer assignments while MOVING AS LITTLE AS POSSIBLE from the
  * previous solution (quickwit-control-plane/src/indexing_scheduler/
  * scheduling/scheduling_logic.rs:43-56 `solve` and
  * scheduling_logic_model.rs). Three phases over the previous solution:
  *
  *  1. remove extraneous shards — sources assigned more shards than the
  *     problem asks for shed the excess from the indexers with the LEAST
  *     available capacity first (scheduling_logic.rs:62-123);
  *  2. enforce indexer cpu capacity — an over-loaded indexer sheds WHOLE
  *     sources in increasing per-source load order (ties by source ord),
  *     including the source that crosses the remainder
  *     (scheduling_logic.rs:145-184);
  *  3. place unassigned shards — sources sorted by total load descending,
  *     each placed greedily on the indexer with the most available
  *     capacity (max-heap, ties to the higher ord like Rust's
  *     BinaryHeap<(cap, ord)>); if placement fails, ALL capacities scale
  *     ×1.2 (ceil) and placement restarts, ≤30 attempts
  *     (scheduling_logic.rs:198-320).
  *
  * Before phase 1, capacities inflate so (a) the smallest indexer fits the
  * largest single shard and (b) total capacity exceeds 120% of total load
  * (mod.rs:484-509) — the solver is about RELATIVE placement, not
  * admission control.
  *
  * Driver-side planning logic (like MergePolicy / ShardScaling): the
  * output is a plan of at most #indexers × #sources entries; Spark
  * executes the resulting routing, never this solver. */
object IndexingScheduler {

  final case class Source(sourceOrd: Int, loadPerShard: Int, numShards: Int) {
    require(loadPerShard > 0, "load_per_shard is NonZeroU32")
  }

  final case class Problem(indexerCpuCapacities: Vector[Int], sources: Vector[Source]) {
    require(indexerCpuCapacities.nonEmpty && indexerCpuCapacities.forall(_ > 0))
    def totalLoad: Long = sources.map(s => s.numShards.toLong * s.loadPerShard).sum
    def scaled(factor: Double): Problem =
      copy(indexerCpuCapacities = indexerCpuCapacities.map(c => math.ceil(c * factor).toInt))
  }

  /** indexer ord → (source ord → num shards), zero entries absent. */
  final case class Solution(assignments: Vector[SortedMap[Int, Int]]) {
    def numShards(indexer: Int, source: Int): Int =
      assignments(indexer).getOrElse(source, 0)
    def totalCpuLoad(problem: Problem, indexer: Int): Long =
      assignments(indexer).map { case (s, n) => problem.sources(s).loadPerShard.toLong * n }.sum
    def availableCapacity(problem: Problem, indexer: Int): Long =
      problem.indexerCpuCapacities(indexer) - totalCpuLoad(problem, indexer)
  }
  object Solution {
    def empty(numIndexers: Int): Solution =
      Solution(Vector.fill(numIndexers)(SortedMap.empty[Int, Int]))
  }

  def solve(problem0: Problem, previous: Solution): Solution = {
    require(problem0.indexerCpuCapacities.length == previous.assignments.length,
      "previous solution must have the problem's indexer count")
    val problem = inflateNodeCapacitiesIfNecessary(problem0)
    val s1 = removeExtraneousShards(problem, previous)
    val s2 = enforceIndexersCpuCapacity(problem, s1)
    placeUnassignedShards(problem, s2)
  }

  /** mod.rs:484-509. */
  private[route] def inflateNodeCapacitiesIfNecessary(p0: Problem): Problem = {
    if (p0.sources.isEmpty) return p0
    val largestShardLoad = p0.sources.map(_.loadPerShard).max
    val minCapacity = p0.indexerCpuCapacities.min
    val p1 =
      if (minCapacity < largestShardLoad)
        p0.scaled(largestShardLoad.toDouble / minCapacity)
      else p0
    val totalCapacity = p1.indexerCpuCapacities.map(_.toLong).sum.toDouble
    val inflatedLoad = p1.totalLoad * 1.2
    if (inflatedLoad >= totalCapacity) p1.scaled(inflatedLoad / totalCapacity) else p1
  }

  /** Phase 1 (scheduling_logic.rs:62-123). */
  private[route] def removeExtraneousShards(problem: Problem, sol: Solution): Solution = {
    val assigned = new Array[Int](problem.sources.length)
    sol.assignments.foreach(_.foreach { case (s, n) => assigned(s) += n })
    val available: Array[Long] =
      sol.assignments.indices.map(i => sol.availableCapacity(problem, i)).toArray
    var out = sol.assignments
    for (src <- problem.sources) {
      var toRemove = assigned(src.sourceOrd) - src.numShards
      if (toRemove > 0) {
        // indexers holding this source, least available capacity first
        val holders = out.indices
          .filter(i => out(i).getOrElse(src.sourceOrd, 0) > 0)
          .sortBy(available(_))
        for (i <- holders if toRemove > 0) {
          val had = out(i)(src.sourceOrd)
          val removed = math.min(had, toRemove)
          out = out.updated(i,
            if (had > removed) out(i).updated(src.sourceOrd, had - removed)
            else out(i) - src.sourceOrd)
          available(i) += removed.toLong * src.loadPerShard
          toRemove -= removed
        }
      }
    }
    Solution(out)
  }

  /** Phase 2 (scheduling_logic.rs:145-184). */
  private[route] def enforceIndexersCpuCapacity(problem: Problem, sol: Solution): Solution =
    Solution(sol.assignments.zipWithIndex.map { case (asg, i) =>
      val total = asg.map { case (s, n) => problem.sources(s).loadPerShard.toLong * n }.sum
      val cap = problem.indexerCpuCapacities(i)
      if (total <= cap) asg
      else {
        var toRemove = total - cap
        // whole sources, smallest per-source load first (ties: source ord —
        // Rust sorts (CpuCapacity, SourceOrd) tuples)
        val byLoad = asg.toSeq
          .map { case (s, n) => (problem.sources(s).loadPerShard.toLong * n, s) }
          .sorted
        var kept = asg
        var done = false
        for ((srcLoad, s) <- byLoad if !done) {
          kept -= s
          if (toRemove <= srcLoad) done = true else toRemove -= srcLoad
        }
        kept
      }
    })

  /** scheduling_logic.rs:320-345. Unassigned remainder per source, in
    * descending total-load order (stable: ties keep source-ord order). */
  private[route] def computeUnassignedSources(problem: Problem, sol: Solution): Seq[Source] = {
    val assigned = new Array[Int](problem.sources.length)
    sol.assignments.foreach(_.foreach { case (s, n) => assigned(s) += n })
    problem.sources
      .map(src => src.copy(numShards = src.numShards - assigned(src.sourceOrd)))
      .filter(_.numShards > 0)
      .sortBy(src => -(src.numShards.toLong * src.loadPerShard))
  }

  /** Phase 3 (scheduling_logic.rs:226-318): greedy max-capacity placement
    * with ×1.2 capacity inflation retries. */
  private[route] def placeUnassignedShards(problem0: Problem, partial: Solution): Solution = {
    val unassigned = computeUnassignedSources(problem0, partial)
    var problem = problem0
    var attempt = 0
    while (attempt < 30) {
      attemptPlace(unassigned, problem, partial) match {
        case Some(sol) => return sol
        case None      => problem = problem.scaled(1.2); attempt += 1
      }
    }
    throw new IllegalStateException("failed to assign all sources in 30 attempts")
  }

  private def attemptPlace(unassigned: Seq[Source], problem: Problem,
                           partial: Solution): Option[Solution] = {
    // max-heap on (available capacity, indexer ord) — ties to the higher
    // ord, matching Rust's BinaryHeap tuple ordering
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Int)]
    partial.assignments.indices.foreach { i =>
      heap.enqueue((partial.availableCapacity(problem, i), i))
    }
    var out = partial.assignments
    for (src <- unassigned) {
      var remaining = src.numShards
      while (remaining > 0) {
        val (capacity, i) = heap.dequeue()
        val placable = (capacity / src.loadPerShard).toInt
        val toPlace = math.min(placable, remaining)
        if (toPlace == 0) return None
        out = out.updated(i,
          out(i).updated(src.sourceOrd, out(i).getOrElse(src.sourceOrd, 0) + toPlace))
        heap.enqueue((capacity - toPlace.toLong * src.loadPerShard, i))
        remaining -= toPlace
      }
    }
    Some(Solution(out))
  }
}
