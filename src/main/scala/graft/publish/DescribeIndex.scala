package graft.publish

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `index describe` — the CLI's IndexStats over published split metadata
  * (quickwit-cli/src/index.rs:539-560,688-700): total published splits /
  * docs / uncompressed bytes, the index's timestamp range, and
  * DescriptiveStats (index.rs:764-875) for the per-split doc-count and
  * byte-size distributions: mean, population std-deviation
  * (stats.rs:26-38), and q1/q25/q50/q75/q99 quantiles with linear
  * interpolation at rank p·(n−1) (stats.rs:41-58) — exactly Spark's exact
  * `percentile` (and SQL `quantile_cont`) definition, so no custom math is
  * needed. Single full-width aggregate over the split-metadata frame
  * (tiny: one row per split), one partial+final pass, no window.
  * Divergence note: the reference accumulates in f32; we keep f64 (the
  * values differ only past the 4th decimal this output rounds to). */
object DescribeIndex {

  private def descriptive(c: Column, pfx: String): Seq[Column] = Seq(
    round(avg(c), 4).as(s"${pfx}_mean"),
    round(stddev_pop(c), 4).as(s"${pfx}_std"),
    round(percentile(c, lit(0.01)), 4).as(s"${pfx}_q1"),
    round(percentile(c, lit(0.25)), 4).as(s"${pfx}_q25"),
    round(percentile(c, lit(0.50)), 4).as(s"${pfx}_q50"),
    round(percentile(c, lit(0.75)), 4).as(s"${pfx}_q75"),
    round(percentile(c, lit(0.99)), 4).as(s"${pfx}_q99"))

  /** One describe row for a frame of PUBLISHED splits (callers filter state
    * first, as list_all_splits → published does at index.rs:690-696). */
  def stats(splits: DataFrame, numDocs: Column, bytes: Column,
            tsStart: Column, tsEnd: Column): DataFrame = {
    val aggs =
      Seq(count(lit(1)).as("num_splits"),
          sum(numDocs).as("num_docs"),
          sum(bytes).as("num_bytes"),
          min(tsStart).as("ts_min"),
          max(tsEnd).as("ts_max")) ++
        descriptive(numDocs, "docs") ++ descriptive(bytes, "bytes")
    splits.agg(aggs.head, aggs.tail: _*)
  }
}
