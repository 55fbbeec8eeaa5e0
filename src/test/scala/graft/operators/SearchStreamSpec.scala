package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the search-stream export encodings to the reference's
  * serialize/serialize_partitions byte layout
  * (quickwit-search/src/search_stream/mod.rs:36-115). */
class SearchStreamSpec extends SparkTestBase {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("leBytes: i64 little-endian, codegen matches java.nio and handles negatives") {
    import spark.implicits._
    val vals = Seq(0L, 1L, -2L, Long.MaxValue, Long.MinValue, 1618353941000000L)
    val got = vals.toDF("v").select(SearchStream.leBytes(col("v"))).collect()
      .map(r => hex(r.getAs[Array[Byte]](0)))
    val want = vals.map { v =>
      val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hex(bb.putLong(v).array())
    }
    assert(got.toSeq === want)
    assert(hex(LongToLeBytes.encode(1L)) === "0100000000000000")
    assert(hex(LongToLeBytes.encode(-2L)) === "feffffffffffffff")
  }

  test("csvLine: one Display value per line with trailing newline") {
    import spark.implicits._
    val out = Seq(3L, -7L).toDF("v").select(SearchStream.csvLine(col("v")))
      .collect().map(_.getString(0)).mkString
    assert(out === "3\n-7\n")
  }

  test("partitionBuffers: header(partition, payload_size) + values, all u64le") {
    import spark.implicits._
    val df = Seq((5L, 2L), (5L, 1L), (9L, 42L)).toDF("p", "v")
    val rows = SearchStream.partitionBuffers(df, col("p"), col("v"))
      .orderBy("partition").collect()
    val b5 = hex(rows(0).getAs[Array[Byte]]("buffer"))
    // partition 5 · size 16 · values 1,2 (ascending)
    assert(b5 === "0500000000000000" + "1000000000000000" +
      "0100000000000000" + "0200000000000000")
    val b9 = hex(rows(1).getAs[Array[Byte]]("buffer"))
    assert(b9 === "0900000000000000" + "0800000000000000" + "2a00000000000000")
  }
}
