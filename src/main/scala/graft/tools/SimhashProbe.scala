package graft.tools

import graft.functions.Tokenizers
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: recall of simhash hamming blocking vs the full
  * token-Jaccard >= 0.95 pair set on the test corpora. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .appName("simhash-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .withColumn("tokens", Tokenizers.default(col("text")))
      // ground truth: all pairs with distinct-token jaccard >= 0.95
      val tok = docs.select(col("doc_id"), explode(array_distinct(col("tokens"))).as("tk"))
      val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = tok.as("a").join(tok.as("b"),
          col("a.tk") === col("b.tk") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
        .agg(count(lit(1)).as("i"))
      val truth = inter
        .join(sizes.toDF("doc_id1", "n1"), "doc_id1")
        .join(sizes.toDF("doc_id2", "n2"), "doc_id2")
        .withColumn("jaccard", col("i").cast("double") / (col("n1") + col("n2") - col("i")))
        .filter(col("jaccard") >= 0.95)
        .select("doc_id1", "doc_id2")
      // hamming distances of truth pairs
      val fp = Dedup.simhashDf(docs, col("doc_id"), col("tokens"), keepEmpty = true)
      val withHam = truth
        .join(fp.toDF("doc_id1", "fp1"), "doc_id1")
        .join(fp.toDF("doc_id2", "fp2"), "doc_id2")
        .withColumn("hamming", Dedup.hammingDist(col("fp1"), col("fp2")))
      val hist = withHam.groupBy("hamming").count().orderBy("hamming").collect()
      println(s"== $sf truth pairs: ${truth.count()}; hamming hist: " +
        hist.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      val got = Dedup.simhashVerifiedDups(docs, col("doc_id"), col("tokens"),
        maxHamming = 3, threshold = 0.95).select("doc_id1", "doc_id2")
      println(s"== $sf verified(h<=3): ${got.count()}  missing: ${truth.except(got).count()}")
    }
    spark.stop()
  }
}
