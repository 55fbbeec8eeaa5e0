package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-calibration probe for the scaling bench: a pure-CPU codegen'd
  * job (hash + popcount over a range — no shuffle, no cache, no IO) run at
  * a given core count. Its N→4N ratio is the CEILING any real pipeline can
  * reach on this box; BENCH/BASELINE.md cites it so the pipeline's measured
  * efficiency is judged against what the hardware actually offers.
  * A second `mem` mode measures the MEMORY-BANDWIDTH ceiling instead: it
  * streams a cached ~70 B/row string column (the pipeline's text shape)
  * through xxhash64 — per-core work constant, traffic dominated by cache
  * reads. Real pipelines sit between the two ceilings depending on how
  * byte-bound they are.
  * Usage: runMain graft.CalibrationProbe <cores> [rows] [cpu|mem]. */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val mode = args.lift(2).getOrElse("cpu")
    val defaultRows = if (mode == "mem") cores * 3000000L else 400000000L
    val rows = args.lift(1).map(_.toLong).getOrElse(defaultRows)
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.ui.enabled", value = false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    if (mode == "mem") {
      val df = s.range(0, rows, 1, cores * 4)
        .select(concat(lit("INFO CALL tool_"), pmod(col("id"), lit(97)),
          lit("(k="), pmod(col("id"), lit(997)),
          lit(") -> OK pad pad pad pad pad pad pad")).as("text"))
        .persist()
      df.count() // materialize the cache (not measured)
      df.select(sum(bit_count(xxhash64(col("text"))))).collect() // warm-up pass
      val passes = 10
      val t0 = System.nanoTime()
      for (_ <- 1 to passes) // bit_count: ANSI-safe sum
        df.select(sum(bit_count(xxhash64(col("text"))))).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE mode=mem cores=$cores rows=$rows passes=$passes secs=$secs%.2f rows_per_core_sec=${rows.toDouble * passes / secs / cores}%.0f")
    } else {
      s.range(0, rows / 20, 1, cores * 4)
        .select(sum(bit_count(xxhash64(col("id"), col("id") + 1)))).collect() // warm-up
      val t0 = System.nanoTime()
      s.range(0, rows, 1, cores * 4)
        .select(sum(bit_count(xxhash64(col("id"), col("id") + 1, col("id") + 2)))).collect()
      println(f"PROBE mode=cpu cores=$cores secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    s.stop()
  }
}
