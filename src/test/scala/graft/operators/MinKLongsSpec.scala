package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Bounded top-k collector: equals sort-then-take under any partitioning,
  * and its partial buffers stay k-bounded (the property that makes a
  * match-all msearch shuffle buffers, not rows). */
class MinKLongsSpec extends SparkTestBase {

  test("agrees with sort-then-take over a multi-partition frame") {
    import spark.implicits._
    val xs = (1L to 10000L).map(i => (i * 2654435761L) % 99991L)
    val got = xs.toDF("v").repartition(13)
      .agg(udaf(new MinKLongsAggregator(10), Encoders.scalaLong)(col("v")))
      .head().getSeq[Long](0)
    assert(got === xs.sorted.take(10))
  }

  test("reduce/merge keep the buffer bounded and compaction preserves the k smallest") {
    val k = 5
    val prop = Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val agg = new MinKLongsAggregator(k)
      val b1 = xs.foldLeft(agg.zero)(agg.reduce)
      val b2 = ys.foldLeft(agg.zero)(agg.reduce)
      val bounded = b1.length < 2 * k && b2.length < 2 * k
      val merged = agg.finish(agg.merge(b1, b2))
      bounded && merged.toSeq == (xs ++ ys).sorted.take(k)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("duplicates are kept, not deduped (top-k of values, not distinct values)") {
    val agg = new MinKLongsAggregator(3)
    val b = Seq(5L, 1L, 1L, 9L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b).toSeq === Seq(1L, 1L, 1L))
  }
}
