package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators: fixed-length sequence packing and
  * deterministic mixture sampling — the two steps an LLM pretraining
  * pipeline runs after filtering/dedup to turn a document corpus into a
  * token budget-shaped training mix (GPT-3, Brown et al. 2020 §2.2:
  * documents are concatenated and chunked into fixed-length sequences;
  * The Pile, Gao et al. 2021 §1: per-source mixture weights).
  */
object TrainingMix {

  /** GPT-style sequence packing: conceptually concatenate all documents
    * (in deterministic order) and chunk the token stream at `budget`
    * tokens; a document may span a seam. Emits per doc: its bucket, the
    * exclusive running-token start offset within the bucket, the first and
    * last chunk (sequence) ids it lands in, and its offset inside the
    * first sequence.
    *
    * Scale shape: documents are bucketed by `pmod(docId, numBuckets)` and
    * each bucket packs an INDEPENDENT token stream — sequences never span
    * buckets, so the running-sum window is bounded by bucket size (the
    * SplitSealing lesson: never a global window). At 100 TB pick
    * numBuckets ≈ corpus/10⁶ docs and every window task stays small; the
    * bucket id also becomes the shard key of the emitted training shards.
    */
  def packSequences(docs: DataFrame, docId: String, tokenCount: String,
                    budget: Long, numBuckets: Int): DataFrame = {
    require(budget > 0 && numBuckets > 0)
    val bucket = pmod(col(docId), lit(numBuckets.toLong)).as("bucket")
    val w = Window.partitionBy(col("bucket")).orderBy(col(docId))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(docId), col(tokenCount).cast("long").as("n_tokens"), bucket)
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .select(col(docId), col("bucket"), col("n_tokens"),
        (col("end_tok") - col("n_tokens")).as("start_tok"),
        floor((col("end_tok") - col("n_tokens")) / budget).as("first_seq"),
        // last token index is end_tok - 1; empty docs stay in first_seq
        floor(greatest(col("end_tok") - 1, col("end_tok") - col("n_tokens")) / budget)
          .as("last_seq"),
        pmod(col("end_tok") - col("n_tokens"), lit(budget)).as("offset_in_seq"))
  }

  /** Deterministic per-source mixture sampling: keep a row iff its
    * uniform-in-[0,1) coordinate `u(docId)` falls under the source's
    * configured rate. `u` is a pure function of the doc id (a Weyl-style
    * residue, NOT a random number) so reruns, retries and the oracle all
    * agree row-for-row — the property that makes a 100 TB sampling job
    * resumable with exactly-once semantics and no RNG state.
    *
    * Sources absent from `rates` default to rate 0 (dropped) — a mixture
    * spec is a whitelist. The rate map rides the plan as a literal
    * when/otherwise ladder (mixture specs are small), staying codegen'd
    * with no join.
    */
  def sampleMixture(docs: DataFrame, docId: String, source: String,
                    rates: Map[String, Double]): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val u = pmod(col(docId) * 37L + 11L, lit(1000L)).cast("double") / 1000.0
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
      when(col(source) === src, lit(r)).otherwise(acc)
    }
    docs.withColumn("u", u).withColumn("rate", rate)
      .withColumn("keep", col("u") < col("rate"))
  }

  /** Deterministic global shuffle for training order: order by a seeded
    * content hash of the doc id. Same seed → identical order on any
    * cluster size or partitioning (a `rand()` sort is neither reproducible
    * nor resumable); changing the seed re-shuffles. md5 is used (not
    * xxhash64) so the order is engine-portable — any SQL engine recomputes
    * it byte-for-byte. Scale shape: one TakeOrdered-free range sort
    * (Spark's sort-shuffle on the hash key, perfectly balanced because the
    * key is uniform); the hash column is retained for resume ("continue
    * after hash X" is a pushdown-friendly range predicate). */
  def deterministicShuffle(docs: DataFrame, docId: String, seed: Long): DataFrame =
    docs
      .withColumn("shuffle_key", md5(concat_ws(":", lit(seed), col(docId).cast("string"))))
      .orderBy(col("shuffle_key"), col(docId))

  /** Hash-based train/holdout split: bucket = first 8 hex chars of the
    * seeded md5 taken mod `buckets`; docs with bucket < holdoutBuckets go
    * to eval. Deterministic, stable under corpus growth (membership
    * depends only on the doc id — appending data never flips existing
    * assignments, unlike fractional sampling by row position), and
    * engine-portable for the same reason as [[deterministicShuffle]]. */
  def holdoutSplit(docs: DataFrame, docId: String, seed: Long,
                   buckets: Int = 100, holdoutBuckets: Int = 1): DataFrame = {
    require(holdoutBuckets >= 0 && holdoutBuckets <= buckets)
    val bucket = pmod(
      conv(substring(md5(concat_ws(":", lit(seed), col(docId).cast("string"))), 1, 8), 16, 10)
        .cast("long"),
      lit(buckets.toLong))
    docs.withColumn("split_bucket", bucket)
      .withColumn("split", when(col("split_bucket") < holdoutBuckets, "eval")
        .otherwise("train"))
  }
}
