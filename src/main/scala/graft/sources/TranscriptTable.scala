package graft.sources

import graft.model.Turn
import graft.publish.{Checkpoint, Manifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-layout transcript table: `data/part-*.parquet` +
  * `metadata/snapshot-N.json` (per-file row counts + ts min/max — the
  * split_metadata). No Iceberg runtime jar exists offline, so the read path
  * is plain Parquet over a manifest-pruned file list; swapping to
  * `format("iceberg")` is one line when the jar is present (SURVEY.md §7.1).
  *
  * Metadata-level pruning mirrors `list_relevant_splits` split pruning by
  * time range (quickwit-search/src/root.rs:1037-1052): files whose
  * [min_ts, max_ts] is disjoint from the query range are never opened.
  */
final class TranscriptTable(val dir: String, spark: SparkSession) {

  val store = new Manifest.Store(dir)

  /** Write a batch of turns as one published "split" set: one parquet file
    * group per writer partition, then atomically publish manifest entries
    * with per-file stats + a checkpoint delta. */
  def append(df: DataFrame, delta: Checkpoint.Delta, numFiles: Int = 4): Unit = {
    val batchId = store.currentSnapshot().map(_.snapshotId + 1).getOrElse(1L)
    val subdir = s"$dir/data/batch-$batchId"
    df.repartition(numFiles).write.mode("overwrite")
      .option("compression", "zstd") // docstore zstd analog (indexer.rs:529-537)
      .parquet(subdir)
    // per-file stats → manifest entries
    val stats = spark.read.parquet(subdir)
      .withColumn("_file", input_file_name())
      .groupBy("_file")
      .agg(count(lit(1)).as("num_docs"),
           sum(coalesce(octet_length(col("text")).cast("long"), lit(0L))).as("bytes"),
           min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
      .collect()
    val entries = stats.zipWithIndex.map { case (r, i) =>
      Manifest.SplitEntry(
        splitId = s"split-$batchId-$i",
        partitionId = 0L,
        numDocs = r.getAs[Long]("num_docs"),
        uncompressedBytes = r.getAs[Long]("bytes"),
        timeRangeStartMicros = tsMicros(r.getAs[java.sql.Timestamp]("min_ts")),
        timeRangeEndMicros = tsMicros(r.getAs[java.sql.Timestamp]("max_ts")),
        tags = Nil, termCardinality = 0L, postingsCount = 0L,
        numMergeOps = 0, deleteOpstamp = 0L,
        files = Seq(r.getAs[String]("_file")))
    }
    store.publish(entries.toSeq, Set.empty, delta) match {
      case Left(err) => throw new IllegalStateException(s"publish failed: $err")
      case Right(_)  => ()
    }
  }

  private def tsMicros(t: java.sql.Timestamp): Long =
    if (t == null) 0L else t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Scan with metadata-level time pruning: only files overlapping
    * [startMicros, endMicros) are read. Returns an empty frame when the
    * manifest prunes everything (the count-from-metadata fast path's cousin). */
  def scan(startMicros: Option[Long] = None, endMicros: Option[Long] = None): DataFrame = {
    val snap = store.currentSnapshot()
      .getOrElse(throw new IllegalStateException(s"no snapshot in $dir"))
    val files = snap.splits
      .filter { s =>
        startMicros.forall(s.timeRangeEndMicros >= _) &&
          endMicros.forall(s.timeRangeStartMicros < _)
      }
      .flatMap(_.files)
    if (files.isEmpty) spark.emptyDataset(spark.implicits.newProductEncoder[Turn]).toDF()
    else spark.read.parquet(files.map(_.replaceFirst("^file:", "")): _*)
  }

  /** Count answered purely from split metadata — the reference's
    * MatchAll+max_hits=0 fast path (root.rs:583-618): no data file is read. */
  def countFromMetadata(): Long =
    store.currentSnapshot().map(_.splits.map(_.numDocs).sum).getOrElse(0L)
}
