package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  * Baseline: brute-force cosine top-k (exact). Scale path: LSH-bucketed
  * (random-hyperplane signatures) and IVF-style (coarse centroids by
  * signature prefix) — both derive their "random" projections
  * deterministically from xxhash64 so results are reproducible with no RNG.
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate — codegen'd, no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * queries: (query_id, qvec) — SMALL (broadcast); corpus: (vec_id, vec).
    * One narrow pass over the corpus per partition + a top-k per query
    * (window rank over a k·|Q|-sized intermediate). Norms are computed ONCE
    * per vector before the join — inside the join each pair would pay the
    * norm aggregates again (3× the lambda work). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.withColumn("_cn", norm(col("vec")))
    val q = queries.withColumn("_qn", norm(col("qvec")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", dot(col("vec"), col("qvec")) / (col("_cn") * col("_qn")))
      .drop("_cn", "_qn")
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * xxhash64(p, i) mapped to [-1, 1). */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(p, i), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a long.
    * `planeOffset` selects an independent plane family (one per LSH table —
    * tables MUST use distinct hyperplanes or multi-table probing degenerates
    * to re-salting one partition of the space and adds no recall). */
  def rhpSignature(vec: Column, bits: Int, planeOffset: Column = lit(0)): Column =
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (v, i) => v * planeComponent(p + planeOffset, i)),
          lit(0.0d), (acc, v) => acc + v)
        when(proj > 0, call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(lit(0L))
      }),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

  /** LSH-bucketed ANN: candidates share the signature bucket in ≥1 of
    * `tables` independent tables (each with its own hyperplane family),
    * exact cosine re-rank inside buckets. At 100 TB the bucket join replaces
    * the cross product — shuffle keyed on (table, bucket), bounded bucket
    * sizes; recall is tuned by (bits↓, tables↑). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 12, tables: Int = 4): DataFrame = {
    def sigTables(df: DataFrame, vecCol: String): DataFrame =
      df.select(col("*"),
        posexplode(transform(sequence(lit(0), lit(tables - 1)), t =>
          rhpSignature(col(vecCol), bits, t * bits))))
        .withColumnRenamed("pos", "table_id").withColumnRenamed("col", "bucket")
    val corpusB = sigTables(corpus, "vec")
    val queriesB = sigTables(queries, "qvec")
    val cand = corpusB.join(queriesB, Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "qvec", "vec_id", "vec").distinct()
    val scored = cand.withColumn("cos", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Embedding near-dup PAIRS via LSH bucketing + exact cosine verify — the
    * scale path that replaces the all-pairs crossJoin of the exact baseline
    * (`d_embed_cosine`): candidates only form inside (table, bucket) groups,
    * then the exact cosine keeps pairs ≥ `threshold`. With wide probing the
    * output equals the exact pair set; at 100 TB `bits` rises to shrink
    * buckets and recall degrades gracefully instead of the join exploding. */
  def lshNearDupPairs(df: DataFrame, id: Column, vec: Column, threshold: Double,
                      bits: Int = 2, tables: Int = 16): DataFrame = {
    val base = df.select(id.as("doc_id"), vec.as("v"))
    val buckets = base.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(tables - 1)),
          t => rhpSignature(col("v"), bits, t * bits))))
      .withColumnRenamed("pos", "table_id").withColumnRenamed("col", "bucket")
    val a = buckets.as("a"); val b = buckets.as("b")
    val cand = a.join(b,
        col("a.table_id") === col("b.table_id") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
      .distinct()
    val withNorm = base.withColumn("n", norm(col("v")))
    cand
      .join(withNorm.toDF("doc_id1", "v1", "n1"), "doc_id1")
      .join(withNorm.toDF("doc_id2", "v2", "n2"), "doc_id2")
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select("doc_id1", "doc_id2", "cos")
  }

  /** Per-centroid projection scores for IVF coarse quantization (anchors =
    * deterministic hash-derived directions). */
  private def ivfScores(vec: Column, nlist: Int): Column =
    transform(sequence(lit(0), lit(nlist - 1)), c => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) => v * planeComponent(c + 10000, i)),
        lit(0.0d), (acc, v) => acc + v)
      struct(proj.as("score"), c.as("list_id"))
    })

  /** IVF-style coarse quantization: assign every vector to the nearest of
    * `nlist` deterministic anchor vectors. */
  def ivfAssign(vec: Column, dim: Int, nlist: Int): Column =
    array_max(ivfScores(vec, nlist)).getField("list_id")

  /** The `nprobe` best lists for a query vector (descending score). */
  def ivfProbeLists(vec: Column, nlist: Int, nprobe: Int): Column =
    transform(
      slice(reverse(array_sort(ivfScores(vec, nlist))), 1, nprobe),
      s => s.getField("list_id"))

  /** IVF ANN: corpus vectors bucket into their nearest list; each query
    * probes its `nprobe` best lists; exact cosine re-rank inside the probed
    * lists. At scale the list assignment is a narrow pass and the join is
    * keyed on list_id — candidate volume ≈ nprobe/nlist of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val corpusL = corpus
      .withColumn("list_id", ivfAssign(col("vec"), dim = 0, nlist))
      .withColumn("_cn", norm(col("vec")))
    val queriesL = queries
      .select(col("*"), explode(ivfProbeLists(col("qvec"), nlist, nprobe)).as("list_id"))
      .withColumn("_qn", norm(col("qvec")))
    val scored = corpusL.join(broadcast(queriesL), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vec"), col("qvec")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }
}
