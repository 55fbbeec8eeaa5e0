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
}
