package graft
import graft.pipeline.IndexingPipeline
import graft.publish.Checkpoint
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given SF, plus
  * one end-to-end indexing-pipeline run (parse→route→aggregate→publish) whose
  * throughput in turns/sec is the BASELINE's headline metric. Emits ONE JSON
  * line. The two-parallelism scaling evidence lives in graft.ScalingBench →
  * BENCH/BASELINE.md. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like every other main: zone-less timestamp literals in queries
      // and TimestampPruning's UTC bound interpretation must agree
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those queries (iteration aid;
    // unset = the driver's full run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(ns => SparkEntry.queries.filter(kv => ns(kv._1)))
    // Warmup, timed separately (warmup_sec): first-job costs (parquet
    // reader + codegen + JIT spin-up, ~5-10 s on this box) otherwise land
    // entirely on whichever query iterates first, misattributing its cost.
    val w0 = System.nanoTime()
    try {
      Seq("documents", "events").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .filter(org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col(
              if (t == "documents") "text" else "event_type")) > 0)
          .count()
      }
    } catch { case _: Throwable => () }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // end-to-end pipeline throughput on the transcripts derived from this SF
    val (pipeSecs, turnsPerSec) =
      try {
        val input = SparkEntry.transcripts(spark, sfDir).persist()
        val n = input.count()
        val out = java.nio.file.Files.createTempDirectory("graft_bench_pipe").toString
        val t0 = System.nanoTime()
        IndexingPipeline.run(spark, input, out,
          Checkpoint.Delta(Seq(Checkpoint.PartitionDelta("bench", -1, n))),
          IndexingPipeline.Config(shufflePartitions = cpus.toInt))
        val secs = (System.nanoTime() - t0) / 1e9
        input.unpersist()
        (secs, n / secs)
      } catch { case _: Throwable => (-1.0, -1.0) }
    val qs = (results + ("pipeline_e2e" -> pipeSecs))
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.sum + math.max(pipeSecs, 0.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_turns_per_sec":$turnsPerSec,"warmup_sec":$warmupSec}""")
    spark.stop()
  }
}
