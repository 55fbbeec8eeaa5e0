package graft.publish

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins `index describe` math to the reference's own definitions
  * (quickwit-cli/src/stats.rs:20-58): population std-deviation and linear
  * interpolation quantiles at rank p·(n−1). */
class DescribeIndexSpec extends SparkTestBase {

  test("describe: totals, ts range, mean/std_pop, interpolated quantiles") {
    import spark.implicits._
    val splits = Seq(
      (10L, 100L, 1000L, 1900L),
      (20L, 200L, 1100L, 2000L),
      (30L, 300L, 900L, 1500L),
      (40L, 400L, 1200L, 2200L)
    ).toDF("num_docs", "bytes", "ts_min", "ts_max")
    val r = DescribeIndex.stats(splits, col("num_docs"), col("bytes"),
      col("ts_min"), col("ts_max")).collect()(0)

    assert(r.getAs[Long]("num_splits") === 4L)
    assert(r.getAs[Long]("num_docs") === 100L)
    assert(r.getAs[Long]("num_bytes") === 1000L)
    assert(r.getAs[Long]("ts_min") === 900L && r.getAs[Long]("ts_max") === 2200L)
    // values [10,20,30,40]: mean 25, population variance
    // (15²+5²+5²+15²)/4 = 125 → std 11.1803 (stats.rs:26-38 divides by n)
    assert(r.getAs[Double]("docs_mean") === 25.0)
    assert(r.getAs[Double]("docs_std") === 11.1803)
    // percentile(sorted, p): rank = p/100·(n−1), linear interpolation
    // (stats.rs:41-58): q1 → rank 0.03 → 10.3; q25 → 0.75 → 17.5;
    // q50 → 1.5 → 25.0; q75 → 2.25 → 32.5; q99 → 2.97 → 39.7
    assert(r.getAs[Double]("docs_q1") === 10.3)
    assert(r.getAs[Double]("docs_q25") === 17.5)
    assert(r.getAs[Double]("docs_q50") === 25.0)
    assert(r.getAs[Double]("docs_q75") === 32.5)
    assert(r.getAs[Double]("docs_q99") === 39.7)
    // bytes column runs through the identical math ×10
    assert(r.getAs[Double]("bytes_q50") === 250.0)
    assert(r.getAs[Double]("bytes_std") === 111.8034)
  }

  test("describe: single split degenerates like the reference (len==1 → value)") {
    import spark.implicits._
    val one = Seq((7L, 70L, 5L, 9L)).toDF("num_docs", "bytes", "ts_min", "ts_max")
    val r = DescribeIndex.stats(one, col("num_docs"), col("bytes"),
      col("ts_min"), col("ts_max")).collect()(0)
    assert(r.getAs[Double]("docs_q1") === 7.0 && r.getAs[Double]("docs_q99") === 7.0)
    assert(r.getAs[Double]("docs_std") === 0.0)
  }
}
