package graft.operators

import graft.functions.Tokenizers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring — the reference's default hit ordering
  * (quickwit-search/src/collector.rs:233,819 sorts by tantivy's BM25 score;
  * sort-spec handling collector.rs:44-80). tantivy scores with the Lucene
  * BM25 variant:
  *
  *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
  *   score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Expressed relationally over an exploded postings frame so Catalyst keeps
  * every stage a two-phase hash aggregate: tf is a partial-aggregated
  * groupBy, df and the corpus stats are single-row/tiny broadcasts, and the
  * per-doc sum is map-side combined. At warehouse scale the postings frame
  * and (N, avgdl, df) stats come precomputed from the split metadata
  * (IndexingPipeline writes term/postings cardinalities per split) instead
  * of being derived inline — see [[bm25FromPostings]].
  *
  * tantivy quantizes doc length through a lossy byte-encoded fieldnorm
  * before scoring (one byte per doc, ~4% relative error above 40 tokens);
  * pass `quantizeNorms = true` to reproduce that exact behavior via
  * [[fieldnormQuantize]]. The default scores with the exact `dl` (scores
  * can then differ from tantivy's at the 3rd decimal while ordering stays
  * almost always identical).
  */
object Scoring {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Per-doc BM25 scores for `queryTerms` over `text`, tokenized with the
    * default analyzer. Docs matching no term are absent (score 0 — same as
    * the reference, which only scores postings hits). */
  def bm25(docs: DataFrame, id: Column, text: Column, queryTerms: Seq[String],
           k1: Double = DefaultK1, b: Double = DefaultB,
           quantizeNorms: Boolean = false): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(Tokenizers.default(text)).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // corpus stats: one row — N (docs with ≥1 token) and average doc length
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    scoreFromParts(tf, dl, k1, b, quantizeNorms)
  }

  /** tantivy's per-doc fieldnorm byte codec (fieldnorm/code.rs), which is
    * Lucene's published SmallFloat byte-4 scheme re-derived from its spec:
    * 24 "free" exact values, then a 3-bit mantissa + exponent float over
    * `dl − 24`. Exact for dl ≤ 40 (mantissa still covers the value), lossy
    * above (first collapse: 41 → 40), monotone and idempotent. The bit
    * width of `dl − 24` is taken as the LENGTH OF ITS BINARY STRING
    * (`conv`) — exact integer math, no float-log2 boundary risk, and
    * mirrorable in the DuckDB oracle via `bin()`. */
  def fieldnormQuantize(dl: Column): Column = {
    val j = (dl - lit(24)).cast("bigint")
    val shift = (length(conv(j, 10, 2)) - lit(4)).cast("int")
    val qj = call_function("shiftleft",
      call_function("shiftright", j, shift).bitwiseAND(lit(7)).bitwiseOR(lit(8)),
      shift)
    when(dl < 32, dl.cast("bigint")).otherwise(lit(24L) + qj)
  }

  /** Index-time postings artifact (doc_id, term, tf) — what the packager
    * persists next to the split metadata (packager.rs:235-238 hotcache +
    * num_terms; IndexingPipeline.splitAggregates derives its cardinality
    * stats from the same explode). Written once at indexing time, it lets
    * [[bm25FromPostings]] score WITHOUT re-tokenizing raw text. */
  def buildPostings(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(Tokenizers.default(text)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** The warehouse-scale scoring path: BM25 over a PRECOMPUTED postings
    * frame. tf is read, dl = Σ tf per doc, (N, avgdl, df) derive from the
    * compact postings — the raw-text scan and tokenize pass disappear from
    * query time entirely. Math is [[scoreFromParts]], shared with the
    * inline [[bm25]], so ScoringSpec's equality check holds by
    * construction + a parquet round-trip. */
  def bm25FromPostings(postings: DataFrame, queryTerms: Seq[String],
                       k1: Double = DefaultK1, b: Double = DefaultB,
                       quantizeNorms: Boolean = false): DataFrame = {
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    val tf = postings.filter(col("term").isin(queryTerms: _*))
    scoreFromParts(tf, dl, k1, b, quantizeNorms)
  }

  /** Shared scoring join: tf (doc_id, term, tf) × df (broadcast) × dl ×
    * one-row corpus stats (broadcast), then the per-doc sum — every stage a
    * two-phase hash aggregate or broadcast join. With `quantizeNorms` the
    * per-doc dl passes through the fieldnorm byte codec, while avgdl stays
    * exact — tantivy's average_fieldnorm divides the segment's exact
    * total_num_tokens by doc count (bm25.rs), only the PER-DOC norm is
    * byte-quantized. */
  private def scoreFromParts(tf: DataFrame, dl: DataFrame,
                             k1: Double, b: Double,
                             quantizeNorms: Boolean = false): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val dlEff =
      if (quantizeNorms) dl.withColumn("dl", fieldnormQuantize(col("dl"))) else dl
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dlEff, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("w").as("score"))
  }

  /** Top-k hits by BM25 score (desc, doc_id asc tie) — `_score` sort. */
  def topKByScore(docs: DataFrame, id: Column, text: Column,
                  queryTerms: Seq[String], k: Int,
                  quantizeNorms: Boolean = false): DataFrame =
    bm25(docs, id, text, queryTerms, quantizeNorms = quantizeNorms)
      .orderBy(desc("score"), asc("doc_id")).limit(k)
}
