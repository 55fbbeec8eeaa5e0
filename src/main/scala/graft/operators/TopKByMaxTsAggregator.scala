package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** FindTraceIds as a typed `Aggregator[IN, BUF, OUT]` — the reference's one
  * genuinely custom distributed collector
  * (quickwit-search/src/find_trace_ids_collector.rs:111-611): top-N keys by
  * max event time with per-key dedup, partial per segment and mergeable at
  * the root. `Aggs.topGroupsByMaxTs` expresses the same thing relationally
  * (groupBy + max + TakeOrdered) and is what the engine actually uses; this
  * class exists for the cases the relational form can't cover (e.g. a
  * bounded buffer inside ONE aggregation over an unexploded group) and
  * mirrors the reference's segment/root merge contract.
  *
  * Buffer is a bounded key→maxTs map: `reduce` dedups within a partition,
  * `merge` unions partials, both trim to the top n by (ts desc, key asc) —
  * identical tie rules to the collector.
  */
final case class KeyTs(key: Long, ts: Long)

final class TopKByMaxTsAggregator(n: Int)
    extends Aggregator[KeyTs, Map[Long, Long], Seq[KeyTs]] {

  private def trim(m: Map[Long, Long]): Map[Long, Long] =
    if (m.size <= n) m
    else m.toSeq.sortBy { case (k, t) => (-t, k) }.take(n).toMap

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], a: KeyTs): Map[Long, Long] = {
    val cur = b.getOrElse(a.key, Long.MinValue)
    trim(if (a.ts > cur) b.updated(a.key, a.ts) else b)
  }

  override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
    trim((x.keySet ++ y.keySet).iterator.map { k =>
      k -> math.max(x.getOrElse(k, Long.MinValue), y.getOrElse(k, Long.MinValue))
    }.toMap)

  override def finish(b: Map[Long, Long]): Seq[KeyTs] =
    b.toSeq.map { case (k, t) => KeyTs(k, t) }.sortBy(x => (-x.ts, x.key))

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[KeyTs]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
