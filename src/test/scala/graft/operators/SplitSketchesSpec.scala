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

  test("merged per-split KLL quantiles honor the rank contract") {
    import spark.implicits._
    val vals = (1L to 20000L).map(i => ((i * 48271L) % 20011L).toDouble).toDF("v")
      .withColumn("row_id", monotonically_increasing_id())
    val perSplit = SplitSketches.buildPerSplitQuantiles(
      vals, pmod(abs(hash(col("row_id"))), lit(8)), col("v"))
    assert(perSplit.count() === 8L)
    val r = SplitSketches.mergedQuantiles(perSplit, Seq(0.5, 0.95)).head()
    assert(r.getLong(0) === 20000L)
    // rank(returned) must sit within the published ~1.65% KLL error of the
    // target rank (generous 5% here — merge stacks two compaction rounds)
    for ((p, i) <- Seq(0.5 -> 1, 0.95 -> 2)) {
      val est = r.getDouble(i)
      val rank = vals.filter(col("v") <= est).count().toDouble / 20000L
      assert(math.abs(rank - p) <= 0.05, s"p=$p est=$est rank=$rank")
    }
  }

  test("merged per-split top-terms is EXACT below sketch capacity (terms-agg shape)") {
    import spark.implicits._
    val terms = (1L to 9000L).map(i => s"term_${i % 9}").toDF("term")
      .withColumn("row_id", monotonically_increasing_id())
    val perSplit = SplitSketches.buildPerSplitTopTerms(
      terms, pmod(abs(hash(col("row_id"))), lit(16)), col("term"), maxItems = 64)
    val got = SplitSketches.mergedTopTerms(perSplit, k = 5, maxItems = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // 9000 rows over 9 terms → 1000 each; ties broken by item order in the
    // estimate — just assert the count surface matches groupBy exactly
    assert(got.length === 5)
    assert(got.forall(_._2 === 1000L))
  }

  test("the artifact is metadata-sized: sketch bytes stay in KB at lgK=12") {
    val perSplit = SplitSketches.buildPerSplit(
      users, pmod(abs(hash(col("row_id"))), lit(4)), col("user_id"))
    val maxLen = perSplit.select(max(length(col("hll")))).head().getInt(0)
    assert(maxLen > 0 && maxLen < 16384) // dense HLL at lgK=12 ≈ 2.7 KB
  }
}
