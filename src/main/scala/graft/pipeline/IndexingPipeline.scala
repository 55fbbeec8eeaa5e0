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
      saltChunk: Int = 1024, // turns per range-salt chunk (rollup skew defusal)
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
    // NOTE: tokens are NOT materialized here — an array<string> per row
    // would dominate the shuffle and cache footprint of everything
    // downstream; splitAggregates re-derives terms from `text` after the
    // routed repartition, where the explode is narrow and cache-local.
    // broadcast-join enrichment replaces the routing/index-config lookup
    // (SURVEY.md §2.8); left join: unknown tool keeps the row, sink null.
    val enriched = parsed.valid
      .join(broadcast(tools), Seq("tool"), "left")
      .join(broadcast(roles), Seq("role"), "left")
    val routed = Routing.withPartitionId(
      enriched, Routing.parse(cfg.routingExpr), cfg.maxPartitions)
    (routed, parsed.deadLetter)
  }

  /** Per-conversation rollup with the per-turn text-equality invariant:
    * turns concatenated in (turn_idx) order. `sort_array(collect_list(...))`
    * makes the result independent of shuffle arrival order.
    *
    * The salted variant defuses a hot conv_id (R4) with RANGE salting:
    * salt = turn_idx / chunk, so every salt bucket is a CONTIGUOUS turn
    * range. Each bucket sorts its own ≤chunk turns and pre-joins its text
    * partial; the final per-conv combine only sorts a handful of chunk
    * structs and concatenates their strings — the hot conversation's final
    * reducer does O(#chunks) comparisons instead of re-sorting all its turns
    * (a hashed salt would force exactly that, keeping the skew tail). */
  def conversationRollup(routed: DataFrame, salted: Boolean, cfg: Config): DataFrame = {
    val turnStruct = struct(col("turn_idx"), col("text"))
    val isErr = when(col("call_status") === "ERR" || col("severity") === "ERROR", 1L).otherwise(0L)
    if (!salted) {
      routed.groupBy(col("conv_id"))
        .agg(collect_list(turnStruct).as("_turns"),
             count(lit(1)).as("n_turns"),
             sum(isErr).as("n_errors"),
             min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .withColumn("rollup_text",
          array_join(transform(sort_array(col("_turns")), t => t.getField("text")), "\n"))
        .drop("_turns")
    } else {
      val chunk = math.max(1, cfg.saltChunk)
      routed
        .withColumn("_chunk", (col("turn_idx") / lit(chunk)).cast("long"))
        .groupBy(col("conv_id"), col("_chunk"))
        .agg(collect_list(turnStruct).as("_p_turns"),
             count(lit(1)).as("_p_n"),
             sum(isErr).as("_p_err"),
             min(col("ts")).as("_p_min"), max(col("ts")).as("_p_max"))
        .withColumn("_p_text",
          array_join(transform(sort_array(col("_p_turns")), t => t.getField("text")), "\n"))
        .groupBy(col("conv_id"))
        .agg(collect_list(struct(col("_chunk"), col("_p_text"))).as("_chunks"),
             sum(col("_p_n")).as("n_turns"),
             sum(col("_p_err")).as("n_errors"),
             min(col("_p_min")).as("first_ts"), max(col("_p_max")).as("last_ts"))
        .withColumn("rollup_text",
          array_join(transform(sort_array(col("_chunks")), c => c.getField("_p_text")), "\n"))
        .drop("_chunks")
    }
  }

  /** Split-level aggregates per routed partition — SplitMetadata analog
    * (A10–A12): num_docs, bytes, time range, capped tag set, exact
    * term_cardinality + postings_count (the merge-pipeline stats,
    * packager.rs:230-273 + num_terms()). With `withSketches`, each split
    * also carries an HLL sketch of its distinct terms (`term_hll`), making
    * CROSS-split term cardinality answerable from merged metadata bytes
    * (`SplitSketches.mergedEstimate`) — per-split exact counts don't merge
    * (terms repeat across splits). Off by default: the benched plan is
    * unchanged. */
  def splitAggregates(routed: DataFrame, cfg: Config,
                      withSketches: Boolean = false): DataFrame = {
    // two-level term aggregation instead of countDistinct: grouping on
    // (partition, term) first lets the map-side partial collapse duplicate
    // terms BEFORE the shuffle (volume = distinct terms, not all postings)
    // and avoids the Expand duplication countDistinct+count in one agg
    // would plan; cardinality = count of groups, postings = sum of counts
    val termAggs =
      Seq(count(lit(1)).as("term_cardinality"), sum(col("_tc")).as("postings_count")) ++
        // second-level rows are one per DISTINCT (partition, term), so the
        // sketch sees each term once — no postings inflation
        (if (withSketches) Seq(hll_sketch_agg(col("term"), lit(12)).as("term_hll")) else Nil)
    val termStats = routed
      .select(col("partition_id"), explode(Tokenizers.default(col("text"))).as("term"))
      .groupBy("partition_id", "term").agg(count(lit(1)).as("_tc"))
      .groupBy("partition_id")
      .agg(termAggs.head, termAggs.tail: _*)
    val docStats = routed.groupBy("partition_id")
      .agg(count(lit(1)).as("num_docs"),
           sum(octet_length(col("text")).cast("long")).as("uncompressed_docs_size_in_bytes"),
           min(col("ts")).as("time_range_start"), max(col("ts")).as("time_range_end"),
           slice(sort_array(collect_set(col("tool"))), 1, cfg.tagCap).as("tags"),
           (count_distinct(col("tool")) <= cfg.tagCap).as("tags_complete"))
    docStats.join(termStats, Seq("partition_id"), "left")
  }

  /** Deterministic routed-row set checksum over (sink, conv_id, turn_idx) —
    * the routed-row equality check of the BASELINE. Order-independent and
    * parallelism-invariant: Σ hashes mod 2^64, computed as four overflow-free
    * LONG sums of 16-bit limbs — each limb sum is ≤ 65535·rows, safe in a
    * long up to ~1.4e14 rows, so ANSI mode cannot throw at the 10^12-turn
    * target and the aggregate stays codegen'd (the earlier decimal(38,0)
    * sum paid per-row BigDecimal arithmetic) — recombined with wrapping
    * arithmetic on the driver. */
  private[pipeline] def checksumAggs(h: Column): Seq[Column] =
    (3 to 0 by -1).map { limb =>
      sum(call_function("shiftrightunsigned", h, lit(limb * 16)).bitwiseAND(lit(0xFFFFL)))
        .as(s"_ck_$limb")
    }

  private[pipeline] def combineChecksum(limbSums: Seq[Long]): Long =
    limbSums.zip(Seq(48, 32, 16, 0)).map { case (s, sh) => s << sh }.sum // wrapping = mod 2^64

  def routedChecksum(routedWithSink: DataFrame): Long = {
    val h = xxhash64(coalesce(col("sink"), lit("_null")), col("conv_id"), col("turn_idx"))
    val aggs = checksumAggs(h)
    val r = routedWithSink.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (r.isNullAt(0)) 0L
    else combineChecksum((0 to 3).map(r.getLong))
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
    val timing = sys.env.contains("GRAFT_TIMING")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      if (timing) System.err.println(f"[timing] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val routed = routedRaw
      .repartition(cfg.shufflePartitions, col("partition_id"))
      .persist()
    // One thread per downstream action: after the cache is materialized the
    // five remaining actions (3 sink writes, counts agg, split aggs) are
    // INDEPENDENT reads of the cached frame — submitting them serially left
    // the cluster idle between jobs and capped 8→32-core efficiency at 0.41
    // (VERDICT r1 "next" #6); concurrent submission lets the scheduler
    // interleave their tasks and the wall clock approach max(), not sum().
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    implicit val ec: concurrent.ExecutionContext =
      concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // materialize parse+shuffle+cache ONCE before fanning out — concurrent
      // first-touch of an unmaterialized cache would race partition
      // computation instead of sharing it
      timed("materialize") { routed.count() }

      val fErrorIndex = concurrent.Future(timed("error_index") {
        routed.filter(col("call_status") === "ERR" || col("severity") === "ERROR")
          .write.mode("overwrite").option("compression", "zstd")
          .partitionBy("sink").parquet(s"$outDir/error_index/batch-$batchId")
      })
      val fRollup = concurrent.Future(timed("rollup") {
        conversationRollup(routed, salted, cfg)
          .write.mode("overwrite").option("compression", "zstd")
          .parquet(s"$outDir/rollup/batch-$batchId")
      })
      val fDeadLetter = concurrent.Future(timed("dead_letter") {
        deadLetter.write.mode("overwrite").parquet(s"$outDir/dead_letter/batch-$batchId")
      })

      // error/rollup counts + routed checksum + valid-row count in ONE
      // aggregate job over the persisted frame. Dead-letter count = input −
      // valid: parse partitions the input exactly two ways, and count(*)
      // over the raw input is answered from parquet footers — no third
      // parse pass.
      val fCounts = concurrent.Future(timed("counts+checksum") {
        val h = xxhash64(coalesce(col("sink"), lit("_null")), col("conv_id"), col("turn_idx"))
        val aggs = Seq(
          sum(when(col("call_status") === "ERR" || col("severity") === "ERROR", 1L)
            .otherwise(0L)).as("errors"),
          count_distinct(col("conv_id")).as("rollups"),
          count(lit(1)).as("valid")) ++ checksumAggs(h)
        val r = routed.agg(aggs.head, aggs.tail: _*).collect()(0)
        val cks = if (r.isNullAt(3)) 0L else combineChecksum((3 to 6).map(r.getLong))
        (SinkCounts(
          errorIndex = Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
          rollup = r.getLong(1),
          deadLetter = input.count() - r.getLong(2)), cks)
      })

      val fSplits = concurrent.Future(timed("split_aggs") {
        splitAggregates(routed, cfg)
          // NTZ-safe: convert to epoch µs inside the plan — collecting raw
          // ts columns yields LocalDateTime for TIMESTAMP_NTZ inputs
          .withColumn("_start_us", unix_micros(col("time_range_start").cast("timestamp_ltz")))
          .withColumn("_end_us", unix_micros(col("time_range_end").cast("timestamp_ltz")))
          .collect()
      }.toSeq.map { r =>
        Manifest.SplitEntry(
          splitId = s"split-$batchId-p${r.getAs[Long]("partition_id")}",
          partitionId = r.getAs[Long]("partition_id"),
          numDocs = r.getAs[Long]("num_docs"),
          uncompressedBytes = r.getAs[Long]("uncompressed_docs_size_in_bytes"),
          timeRangeStartMicros = Option(r.getAs[Any]("_start_us")).map(_.asInstanceOf[Long]).getOrElse(0L),
          timeRangeEndMicros = Option(r.getAs[Any]("_end_us")).map(_.asInstanceOf[Long]).getOrElse(0L),
          tags = r.getAs[scala.collection.Seq[String]]("tags").toSeq,
          termCardinality = Option(r.getAs[Any]("term_cardinality")).map(_.asInstanceOf[Long]).getOrElse(0L),
          postingsCount = Option(r.getAs[Any]("postings_count")).map(_.asInstanceOf[Long]).getOrElse(0L),
          numMergeOps = 0, deleteOpstamp = 0L, files = Nil)
      })

      import scala.concurrent.duration.Duration
      val (counts, checksum) = concurrent.Await.result(fCounts, Duration.Inf)
      val splits = concurrent.Await.result(fSplits, Duration.Inf)
      concurrent.Await.result(fErrorIndex, Duration.Inf)
      concurrent.Await.result(fRollup, Duration.Inf)
      concurrent.Await.result(fDeadLetter, Duration.Inf)

      store.publish(splits, Set.empty, delta) match {
        case Left(err) => throw new IllegalStateException(err)
        case Right(_)  => Some(Result(counts, splits, checksum))
      }
    } finally {
      pool.shutdown()
      routed.unpersist()
    }
  }

}
