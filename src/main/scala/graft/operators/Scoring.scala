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
  * of being derived inline.
  */
object Scoring {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Per-doc BM25 scores for `queryTerms` over `text`, tokenized with the
    * default analyzer. Docs matching no term are absent (score 0 — same as
    * the reference, which only scores postings hits). */
  def bm25(docs: DataFrame, id: Column, text: Column, queryTerms: Seq[String],
           k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(Tokenizers.default(text)).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // corpus stats: one row — N (docs with ≥1 token) and average doc length
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
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
                  queryTerms: Seq[String], k: Int): DataFrame =
    bm25(docs, id, text, queryTerms)
      .orderBy(desc("score"), asc("doc_id")).limit(k)
}
