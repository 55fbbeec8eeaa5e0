package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM (Test/fork := true
  * runs every suite in a single JVM — a per-suite session would pay ~5 s of
  * context startup each). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark

  /** Evaluate a single Column expression over one string value. */
  def evalStr[T](value: String, c: Column => Column): T = {
    import spark.implicits._
    Seq(Option(value)).toDF("v").select(c(org.apache.spark.sql.functions.col("v"))).collect()(0).getAs[T](0)
  }

  def evalTokens(value: String, c: Column => Column): Seq[String] =
    evalStr[scala.collection.Seq[String]](value, c).toSeq

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
