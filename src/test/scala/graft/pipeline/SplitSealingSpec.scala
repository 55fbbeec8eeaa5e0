package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the reference indexer's commit-trigger test shape
  * (indexer.rs:733-870): num-docs target 4 → the 5th doc opens a second
  * split; the first split records NumDocsLimit, the tail records Drained. */
class SplitSealingSpec extends SparkTestBase {

  private def turnsDf(n: Int, conv: String = "c0") = {
    import spark.implicits._
    (0 until n).map(i => (conv, i, 0L)).toDF("conv_id", "turn_idx", "partition_id")
  }

  test("seal at num_docs=4: 5 docs → splits of 4 (NumDocsLimit) + 1 (Drained)") {
    val out = SplitSealing.sealedSplits(turnsDf(5), col("partition_id"), 4)
      .orderBy("split_seq")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(out === Seq((0L, 4L, "num_docs_limit"), (1L, 1L, "drained")))
  }

  test("exact multiple: the last full split still records NumDocsLimit") {
    val out = SplitSealing.sealedSplits(turnsDf(8), col("partition_id"), 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(out === Set((0L, 4L, "num_docs_limit"), (1L, 4L, "num_docs_limit")))
  }

  test("force commit (?refresh bulk): the partial tail seals on ForceCommit, full splits unchanged") {
    val out = SplitSealing.sealedSplits(turnsDf(5), col("partition_id"), 4,
      forceCommit = true)
      .orderBy("split_seq")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // indexed_split.rs:171 — force names why the IN-PROGRESS split sealed;
    // the full one still records its num-docs limit
    assert(out === Seq((0L, 4L, "num_docs_limit"), (1L, 1L, "force_commit")))
  }

  test("two-phase chunked form equals the global-window reference; windows stay chunk-bounded") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // adversarial: EVERYTHING routes to one partition (the r2 shape that
    // funneled the whole partition through one window task), many convs of
    // uneven length, target that straddles conv boundaries
    val df = (for (c <- 0 until 50; t <- 0 until (c % 7) + 1)
      yield (f"conv$c%03d", t, 0L)).toDF("conv_id", "turn_idx", "partition_id")
    // reference: the old single-window global rank
    val wRef = Window.partitionBy(col("partition_id")).orderBy(col("conv_id"), col("turn_idx"))
    val ref = df.withColumn("split_seq", ((row_number().over(wRef) - 1) / 7).cast("long"))
      .select("conv_id", "turn_idx", "split_seq").collect().map(_.toString).sorted.toSeq
    // chunked: full conv_id as chunk key — finest order-consistent chunking
    val got = SplitSealing.withSplitSeq(df, col("partition_id"), 7, chunkCol = col("conv_id"))
      .select("conv_id", "turn_idx", "split_seq").collect().map(_.toString).sorted.toSeq
    assert(got === ref)
    // boundedness: every window partition key is (pid, chunk) — its group
    // size is the conv length (<= 7 here), never the routed-partition total
    val maxChunk = df.groupBy("partition_id", "conv_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxChunk <= 7 && df.count() > maxChunk)
  }

  test("assignment is deterministic and parallelism-invariant") {
    import spark.implicits._
    val df = (for (c <- 0 until 7; t <- 0 until 13)
      yield (s"conv$c", t, (c % 3).toLong)).toDF("conv_id", "turn_idx", "partition_id")
    val a = SplitSealing.withSplitSeq(df.repartition(1), col("partition_id"), 10)
      .select("conv_id", "turn_idx", "split_seq").collect().map(_.toString).sorted.toSeq
    val b = SplitSealing.withSplitSeq(df.repartition(16), col("partition_id"), 10)
      .select("conv_id", "turn_idx", "split_seq").collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
