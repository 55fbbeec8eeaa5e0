package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-calibration probe for the scaling bench: a pure-CPU codegen'd
  * job (hash + popcount over a range — no shuffle, no cache, no IO) run at
  * a given core count. Its N→4N ratio is the CEILING any real pipeline can
  * reach on this box; BENCH/BASELINE.md cites it so the pipeline's measured
  * efficiency is judged against what the hardware actually offers.
  * Usage: runMain graft.CalibrationProbe <cores> [rows]. */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val rows = args.lift(1).map(_.toLong).getOrElse(400000000L)
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.ui.enabled", value = false).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(0, rows / 20, 1, cores * 4)
      .select(sum(bit_count(xxhash64(col("id"), col("id") + 1)))).collect() // warm-up
    val t0 = System.nanoTime()
    s.range(0, rows, 1, cores * 4)
      .select(sum(bit_count(xxhash64(col("id"), col("id") + 1, col("id") + 2)))).collect()
    println(f"PROBE cores=$cores secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    s.stop()
  }
}
