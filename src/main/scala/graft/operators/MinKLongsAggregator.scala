package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k collector: the k SMALLEST longs seen, as a typed
  * `Aggregator` usable from untyped `groupBy(...).agg(udaf(...))`. This is
  * the segment/root collector contract of the reference's top-k search
  * (quickwit-search/src/collector.rs:383-437: each segment keeps a
  * k-bounded heap, the root merges partial heaps) — map-side partial
  * aggregation keeps at most ~2k ids per group per task, so a match-all
  * query shuffles ONLY k-bounded buffers, never the matched rows
  * themselves. Compare a window/row_number rank, which must first shuffle
  * every matched row to sort it.
  *
  * Buffer is an unsorted array amortized to O(1) appends: it grows to 2k,
  * then compacts to the k smallest; merge concatenates and compacts. The
  * result is sorted ascending.
  */
final class MinKLongsAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private def compact(xs: Array[Long]): Array[Long] = {
    if (xs.length <= k) xs
    else {
      val s = xs.clone()
      java.util.Arrays.sort(s)
      s.take(k)
    }
  }

  override def zero: Array[Long] = Array.empty

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    val nb = b :+ a
    if (nb.length >= 2 * k) compact(nb) else nb
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    compact(x ++ y)

  override def finish(b: Array[Long]): Array[Long] = {
    val s = compact(b).clone()
    java.util.Arrays.sort(s)
    s
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
