package graft

import org.apache.spark.sql.SparkSession

/** Driver smoke contract: `SparkEntry.entry` must return rows > 0 on
  * sf0.001. Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    val n = df.count()
    println(s"[smoke] entry rows = $n " + (if (n > 0) "OK" else "FAIL"))
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
