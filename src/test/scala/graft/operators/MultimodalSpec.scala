package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: binary schema, per-partition decode batch
  * shape, frame sampling, blob stats. The codec itself is a deterministic
  * stub (no media libraries offline) — the Spark plumbing is real. */
class MultimodalSpec extends SparkTestBase {
  import Multimodal._

  private def mediaDs = {
    import spark.implicits._
    (1L to 20L).map { i =>
      MediaRow(i, Array.fill[Byte](64 + i.toInt)((i % 7).toByte),
        MediaMeta(if (i % 2 == 0) "image" else "audio", 32, 32, 16000, 1000L))
    }.toDS().repartition(4)
  }

  test("per-partition decode: deterministic features, exact sizes") {
    implicit val s = spark
    val out = decodeFeatures(mediaDs, new StubDecoder(8)).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.size === 20)
    assert(out(3L).n_bytes === 67L)
    assert(out.values.forall(_.features.length === 8))
    // determinism across runs
    val again = decodeFeatures(mediaDs, new StubDecoder(8)).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(again === out.map { case (k, v) => k -> v.features.toSeq })
    // same bytes ⇒ same checksum; different sizes ⇒ different
    assert(out(1L).checksum !== out(2L).checksum)
  }

  test("frame sampling slices fixed-width frames, drops short tails") {
    import spark.implicits._
    val df = Seq(Array.tabulate[Byte](100)(_.toByte)).toDF("media")
    val frames = df.select(sampleFrames(col("media"), n = 4, frameLen = 20, stride = 30))
      .collect()(0).getAs[scala.collection.Seq[Array[Byte]]](0)
    // offsets 0, 30, 60, 90 — the last has only 10 bytes → dropped
    assert(frames.length === 3)
    assert(frames(0).toSeq === (0 until 20).map(_.toByte))
    assert(frames(1).toSeq === (30 until 50).map(_.toByte))
  }

  test("blob stats: size and hash without decode") {
    import spark.implicits._
    val df = Seq((1L, "abc".getBytes), (2L, "abc".getBytes), (3L, "xyz".getBytes))
      .toDF("doc_id", "media")
    val out = withBlobStats(df, col("media"))
      .select("doc_id", "n_bytes", "blob_hash").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === out(2L)._2) // identical bytes, identical hash
    assert(out(1L)._2 !== out(3L)._2)
  }

  test("resize stub truncates oversize blobs, keeps small ones, null-safe") {
    import spark.implicits._
    val df = Seq(Some(Array.fill[Byte](50)(1)), Some(Array.fill[Byte](10)(2)), None)
      .toDF("media")
    val out = df.select(octet_length(resizeStub(col("media"), 20))).collect()
    assert(out(0).getInt(0) === 20)
    assert(out(1).getInt(0) === 10)
    assert(out(2).isNullAt(0))
  }
}
