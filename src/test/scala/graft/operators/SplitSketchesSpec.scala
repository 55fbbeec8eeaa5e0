package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Split-mergeable HLL metadata: error contract, merge-tree associativity
  * (register-wise max → any union shape gives identical registers), and
  * the KB-sized-artifact claim that makes it metadata, not data. */
class SplitSketchesSpec extends SparkTestBase {

  private def users = {
    import spark.implicits._
    // 40k rows over exactly 7919 distinct users, spread across splits
    (1L to 40000L).map(i => (i, i % 7919L)).toDF("row_id", "user_id")
  }

  test("merged per-split estimate honors the HLL error contract at any split count") {
    for (splits <- Seq(1, 8, 64)) {
      val perSplit = SplitSketches.buildPerSplit(
        users, pmod(abs(hash(col("row_id"))), lit(splits)), col("user_id"))
      assert(perSplit.count() === splits.toLong)
      val r = SplitSketches.mergedEstimate(perSplit).head()
      assert(r.getLong(0) === 40000L)
      assert(math.abs(r.getLong(1) - 7919L) <= 7919.0 * 0.05 + 1, s"splits=$splits")
    }
  }

  test("union is associative: two-level merge tree equals one flat union") {
    val perSplit = SplitSketches.buildPerSplit(
      users, pmod(abs(hash(col("row_id"))), lit(16)), col("user_id"))
      .cache()
    val flat = SplitSketches.mergedEstimate(perSplit).head().getLong(1)
    // merge pipeline shape: splits union into intermediate merged splits
    // (split_key % 4), which union at the root — same registers, same value
    val intermediate = perSplit
      .groupBy(pmod(col("split_key"), lit(4)).as("split_key"))
      .agg(sum("n_rows").as("n_rows"), hll_union_agg(col("hll"), lit(true)).as("hll"))
    val treed = SplitSketches.mergedEstimate(intermediate).head().getLong(1)
    perSplit.unpersist()
    assert(treed === flat)
  }

  test("the artifact is metadata-sized: sketch bytes stay in KB at lgK=12") {
    val perSplit = SplitSketches.buildPerSplit(
      users, pmod(abs(hash(col("row_id"))), lit(4)), col("user_id"))
    val maxLen = perSplit.select(max(length(col("hll")))).head().getInt(0)
    assert(maxLen > 0 && maxLen < 16384) // dense HLL at lgK=12 ≈ 2.7 KB
  }
}
