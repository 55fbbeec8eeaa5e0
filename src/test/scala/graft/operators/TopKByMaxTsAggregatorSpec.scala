package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Typed-Aggregator FindTraceIds analog: must agree with the relational
  * groupBy+max+TakeOrdered form whenever no buffer eviction occurs, and be
  * deterministic across partitionings always. */
class TopKByMaxTsAggregatorSpec extends SparkTestBase {

  test("agrees with the relational top-k when keys fit the buffer") {
    import spark.implicits._
    val rows = Seq(
      KeyTs(1L, 100L), KeyTs(1L, 500L), KeyTs(2L, 400L),
      KeyTs(3L, 300L), KeyTs(2L, 50L), KeyTs(4L, 450L))
    val ds = rows.toDS().repartition(3)
    val agg = new TopKByMaxTsAggregator(3)
    val typed = ds.select(agg.toColumn).collect()(0)
    assert(typed === Seq(KeyTs(1L, 500L), KeyTs(4L, 450L), KeyTs(2L, 400L)))
    val relational = Aggs.topGroupsByMaxTs(
        ds.toDF().withColumn("ts_t", col("ts")), col("key"), col("ts_t"), 3)
      .collect().map(r => KeyTs(r.getLong(0), r.getLong(1))).toSeq
    assert(typed === relational)
  }

  test("deterministic across partitionings; dedup keeps max per key") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => KeyTs(i % 17, i * 10))
    val a = rows.toDS().repartition(2).select(new TopKByMaxTsAggregator(5).toColumn).collect()(0)
    val b = rows.toDS().repartition(13).select(new TopKByMaxTsAggregator(5).toColumn).collect()(0)
    assert(a === b)
    assert(a.map(_.key).distinct.size === a.size) // dedup
    assert(a.map(_.ts) === a.map(_.ts).sorted.reverse) // desc order
  }
}
