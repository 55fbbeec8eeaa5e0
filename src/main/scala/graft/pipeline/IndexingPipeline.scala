package graft.pipeline

import graft.functions.Tokenizers
import graft.parse.DocParser
import graft.publish.{Checkpoint, Manifest}
import graft.route.Routing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end indexing job — Quickwit's pipeline
  * Source → DocProcessor → Indexer → Packager → Uploader → Publisher
  * (quickwit-indexing/src/actors/indexing_pipeline.rs:326-464) re-expressed
  * as ONE Spark job:
  *
  *   scan → parse (grok, dead-letter) → tokenize → enrich (broadcast dims)
  *        → route (partition_id, salted on conv_id) → fan-out sinks
  *        → split-level aggregate → atomic manifest publish (+ lineage)
  *
  * Node boundaries = exactly two shuffles: the routed repartition and the
  * rollup aggregation; everything else is narrow and whole-stage-codegen'd.
  */
object IndexingPipeline {

  final case class Config(
      routingExpr: String = "hash_mod((tool,conv_id), 200)",
      maxPartitions: Int = Routing.DefaultMaxPartitions,
      saltBuckets: Int = 16,
      tagCap: Int = 1000, // packager.rs:43-48
      shufflePartitions: Int = 32)

  final case class SinkCounts(errorIndex: Long, rollup: Long, deadLetter: Long)

  final case class Result(
      counts: SinkCounts,
      splits: Seq[Manifest.SplitEntry],
      routedChecksum: Long)

  /** tools/roles dimension frames from the in-code fixtures. */
  def dims(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val tools = graft.model.TranscriptGen.toolsDim
      .toDF("tool", "sink", "category", "is_error_tracked")
    val roles = graft.model.TranscriptGen.rolesDim.toDF("role", "role_group", "weight")
    (tools, roles)
  }

  /** Stage 2–5 (parse → tokenize → enrich → route) as a reusable frame
    * transform, shared by batch and streaming paths. */
  def parseEnrichRoute(input: DataFrame, tools: DataFrame, roles: DataFrame,
                       cfg: Config): (DataFrame, DataFrame) = {
    val parsed = DocParser.parse(input, DocParser.Lenient)
    val tokenized = parsed.valid
      .withColumn("tokens", Tokenizers.default(col("text")))
    // broadcast-join enrichment replaces the routing/index-config lookup
    // (SURVEY.md §2.8); left join: unknown tool keeps the row, sink null.
    val enriched = tokenized
      .join(broadcast(tools), Seq("tool"), "left")
      .join(broadcast(roles), Seq("role"), "left")
    val routed = Routing.withPartitionId(
      enriched, Routing.parse(cfg.routingExpr), cfg.maxPartitions)
    (routed, parsed.deadLetter)
  }

  /** Per-conversation rollup with the per-turn text-equality invariant:
    * turns concatenated in (turn_idx) order. `sort_array(collect_list(...))`
    * makes the result independent of shuffle arrival order; the salted
    * two-phase variant defuses a hot conv_id (R4): partial lists per
    * (conv_id, salt), then flatten + sort at the final combine. */
  def conversationRollup(routed: DataFrame, salted: Boolean, cfg: Config): DataFrame = {
    val turnStruct = struct(col("turn_idx"), col("text"))
    val base =
      if (!salted) {
        routed.groupBy(col("conv_id"))
          .agg(collect_list(turnStruct).as("_turns"),
               count(lit(1)).as("n_turns"),
               sum(when(col("call_status") === "ERR" || col("severity") === "ERROR", 1L)
                 .otherwise(0L)).as("n_errors"),
               min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      } else {
        routed
          .withColumn("_salt", pmod(xxhash64(col("turn_idx")), lit(cfg.saltBuckets)))
          .groupBy(col("conv_id"), col("_salt"))
          .agg(collect_list(turnStruct).as("_p_turns"),
               count(lit(1)).as("_p_n"),
               sum(when(col("call_status") === "ERR" || col("severity") === "ERROR", 1L)
                 .otherwise(0L)).as("_p_err"),
               min(col("ts")).as("_p_min"), max(col("ts")).as("_p_max"))
          .groupBy(col("conv_id"))
          .agg(flatten(collect_list(col("_p_turns"))).as("_turns"),
               sum(col("_p_n")).as("n_turns"),
               sum(col("_p_err")).as("n_errors"),
               min(col("_p_min")).as("first_ts"), max(col("_p_max")).as("last_ts"))
      }
    base
      .withColumn("_sorted", sort_array(col("_turns")))
      .withColumn("rollup_text",
        array_join(transform(col("_sorted"), t => t.getField("text")), "\n"))
      .drop("_turns", "_sorted")
  }

  /** Split-level aggregates per routed partition — SplitMetadata analog
    * (A10–A12): num_docs, bytes, time range, capped tag set, exact
    * term_cardinality + postings_count (the merge-pipeline stats,
    * packager.rs:230-273 + num_terms()). */
  def splitAggregates(routed: DataFrame, cfg: Config): DataFrame = {
    val termStats = routed
      .select(col("partition_id"), explode(col("tokens")).as("term"))
      .groupBy("partition_id")
      .agg(countDistinct(col("term")).as("term_cardinality"),
           count(lit(1)).as("postings_count"))
    val docStats = routed.groupBy("partition_id")
      .agg(count(lit(1)).as("num_docs"),
           sum(octet_length(col("text")).cast("long")).as("uncompressed_docs_size_in_bytes"),
           min(col("ts")).as("time_range_start"), max(col("ts")).as("time_range_end"),
           slice(sort_array(collect_set(col("tool"))), 1, cfg.tagCap).as("tags"),
           (count_distinct(col("tool")) <= cfg.tagCap).as("tags_complete"))
    docStats.join(termStats, Seq("partition_id"), "left")
  }

  /** Deterministic routed-row set checksum over (sink, conv_id, turn_idx) —
    * the routed-row equality check of the BASELINE. Order-independent: sum
    * of per-row hashes in decimal (ANSI mode would throw on a long-sum
    * overflow), reduced mod 2^64 so the result is parallelism-invariant. */
  def routedChecksum(routedWithSink: DataFrame): Long = {
    val d = routedWithSink
      .select(xxhash64(coalesce(col("sink"), lit("_null")), col("conv_id"), col("turn_idx"))
        .cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")))
      .collect()(0).getDecimal(0)
    if (d == null) 0L
    else d.toBigInteger.mod(java.math.BigInteger.ONE.shiftLeft(64)).longValue()
  }

  /** Run the whole pipeline and publish. `delta` identifies the input batch
    * for exactly-once resume: rerunning an already-published delta is
    * rejected by the manifest store and the job becomes a no-op. */
  def run(spark: SparkSession, input: DataFrame, outDir: String,
          delta: Checkpoint.Delta, cfg: Config = Config(),
          salted: Boolean = true): Option[Result] = {
    val store = new Manifest.Store(outDir)
    // resume check: skip already-committed deltas before any work
    store.currentSnapshot().foreach { snap =>
      val cp = Checkpoint.SourceCheckpoint(snap.checkpoint)
      if (cp.checkCompatibility(delta).isLeft) return None
    }
    // batch-scoped sink subdirs: incremental deltas append new file groups
    // instead of clobbering earlier batches (uploader stages per split).
    val batchId = store.currentSnapshot().map(_.snapshotId + 1).getOrElse(1L)
    val (tools, roles) = dims(spark)
    val (routedRaw, deadLetter) = parseEnrichRoute(input, tools, roles, cfg)
    val routed = routedRaw
      .repartition(cfg.shufflePartitions, col("partition_id"))
      .persist()
    try {
      // fan-out sink 1: per-tool error index
      val errorIndex = routed.filter(col("call_status") === "ERR" || col("severity") === "ERROR")
      errorIndex.write.mode("overwrite").option("compression", "zstd")
        .partitionBy("sink").parquet(s"$outDir/error_index/batch-$batchId")
      // fan-out sink 2: per-conversation rollup
      val rollup = conversationRollup(routed, salted, cfg)
      rollup.write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$outDir/rollup/batch-$batchId")
      // fan-out sink 3: dead letter
      deadLetter.write.mode("overwrite").parquet(s"$outDir/dead_letter/batch-$batchId")

      val counts = SinkCounts(
        errorIndex = errorIndex.count(),
        rollup = rollup.count(),
        deadLetter = deadLetter.count())
      val checksum = routedChecksum(routed)

      val splits = splitAggregates(routed, cfg).collect().toSeq.map { r =>
        Manifest.SplitEntry(
          splitId = s"split-$batchId-p${r.getAs[Long]("partition_id")}",
          partitionId = r.getAs[Long]("partition_id"),
          numDocs = r.getAs[Long]("num_docs"),
          uncompressedBytes = r.getAs[Long]("uncompressed_docs_size_in_bytes"),
          timeRangeStartMicros = micros(r.getAs[java.sql.Timestamp]("time_range_start")),
          timeRangeEndMicros = micros(r.getAs[java.sql.Timestamp]("time_range_end")),
          tags = r.getAs[scala.collection.Seq[String]]("tags").toSeq,
          termCardinality = Option(r.getAs[Any]("term_cardinality")).map(_.asInstanceOf[Long]).getOrElse(0L),
          postingsCount = Option(r.getAs[Any]("postings_count")).map(_.asInstanceOf[Long]).getOrElse(0L),
          numMergeOps = 0, deleteOpstamp = 0L, files = Nil)
      }
      store.publish(splits, Set.empty, delta) match {
        case Left(err) => throw new IllegalStateException(err)
        case Right(_)  => Some(Result(counts, splits, checksum))
      }
    } finally routed.unpersist()
  }

  private def micros(t: java.sql.Timestamp): Long =
    if (t == null) 0L else t.getTime * 1000L + (t.getNanos / 1000) % 1000
}
