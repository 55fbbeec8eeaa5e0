package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-level MERGEABLE sketch metadata — the warehouse form of the
  * reference's merge-time metadata combine (merge_executor.rs:330-406
  * derives a merged split's metadata from its inputs' metadata without
  * rescanning docs; packager.rs persists per-split stats at seal time).
  * `IndexingPipeline.splitAggregates` keeps EXACT per-split counters (the
  * bench path); this is the sketch variant for stats that exact counters
  * can't merge — distinct counts. Each split persists a KB-sized HLL
  * sketch of a column next to its row counts; query time unions the
  * sketch BYTES — never rescanning rows — so a 10^12-turn table answers
  * "distinct users in this slice" from metadata alone. Spark 4 ships
  * Apache DataSketches HLL natively (`hll_sketch_agg` / `hll_union_agg`
  * / `hll_sketch_estimate`) — codegen'd aggregates, no UDF, and the
  * union is register-wise max so it composes associatively across any
  * merge tree (exactly how the reference's merge pipeline stacks splits).
  *
  * Estimator note: DataSketches HLL uses the HIP estimator while a single
  * sketch streams updates, but a UNION of sketches falls back to the
  * composite estimator — so a merged estimate is not bit-identical to a
  * one-pass global sketch, only equally error-bounded. Oracles therefore
  * check the published error CONTRACT (like `a_percentiles_approx`), not
  * the picked value.
  */
object SplitSketches {

  /** Per-split sketch artifact: one row per split with (n_rows, hll bytes).
    * This frame is what the packager would persist beside the manifest. */
  def buildPerSplit(df: DataFrame, splitKey: Column, value: Column,
                    lgK: Int = 12): DataFrame =
    df.groupBy(splitKey.as("split_key"))
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(value, lit(lgK)).as("hll"))

  /** Query-time merge: distinct-count estimate from sketch bytes alone —
    * input is the tiny per-split metadata frame, not the data. */
  def mergedEstimate(perSplit: DataFrame): DataFrame =
    perSplit.agg(
      sum(col("n_rows")).as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(true))).as("estimate"))

  /** Per-split KLL quantile sketch (DataSketches, `kll_sketch_agg_double`):
    * the percentile analog — a percentiles agg over 10^12 rows reads merged
    * split sketches, not rows. KLL's rank error at the default k=200 is
    * ~1.65% (published bound); compaction is randomized, so oracles check
    * the rank CONTRACT, not picked values (a_percentiles_approx pattern). */
  def buildPerSplitQuantiles(df: DataFrame, splitKey: Column, value: Column,
                             k: Int = 200): DataFrame =
    df.groupBy(splitKey.as("split_key"))
      .agg(count(lit(1)).as("n_rows"),
        call_function("kll_sketch_agg_double", value, lit(k)).as("kll"))

  /** Query-time quantiles from merged per-split KLL bytes. Returns one row:
    * n_rows plus one column per requested p, named `q<idx>`. */
  def mergedQuantiles(perSplit: DataFrame, ps: Seq[Double]): DataFrame = {
    val merged = call_function("kll_merge_agg_double", col("kll"))
    perSplit.agg(
      sum(col("n_rows")).as("n_rows"),
      (ps.zipWithIndex.map { case (p, i) =>
        call_function("kll_sketch_get_quantile_double", merged, lit(p)).as(s"q$i")
      }): _*)
  }

  /** Per-split frequent-terms sketch (`approx_top_k_accumulate`) — the
    * reference's terms aggregation is exactly this shape: each split's leaf
    * collector emits a partial top-terms result, the root merges partials
    * (intermediate agg results, collector.rs:416-437). `maxItems` ≥ the
    * field's distinct cardinality ⇒ no sketch eviction ⇒ counts are EXACT,
    * which is how the terms-agg query stays DuckDB-checkable. */
  def buildPerSplitTopTerms(df: DataFrame, splitKey: Column, term: Column,
                            maxItems: Int = 1000): DataFrame =
    df.groupBy(splitKey.as("split_key"))
      .agg(count(lit(1)).as("n_rows"),
        call_function("approx_top_k_accumulate", term, lit(maxItems)).as("terms"))

  /** Query-time merged top-k terms from per-split sketch states: combine →
    * estimate → one row per (item, count), ES terms-agg order. */
  def mergedTopTerms(perSplit: DataFrame, k: Int, maxItems: Int = 1000): DataFrame =
    perSplit
      .agg(call_function("approx_top_k_estimate",
        call_function("approx_top_k_combine", col("terms"), lit(maxItems)),
        lit(k)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("doc_count"))
}
