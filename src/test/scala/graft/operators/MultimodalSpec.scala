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
    val out = decodeFeatures(mediaDs, new HashDecoder(8)).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.size === 20)
    assert(out(3L).n_bytes === 67L)
    assert(out.values.forall(_.features.length === 8))
    // determinism across runs
    val again = decodeFeatures(mediaDs, new HashDecoder(8)).collect()
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

  test("REAL PNG decode: hand-computed pixel means on a 2x2 image") {
    // pixels set directly (not through synthPng's formula): decode must
    // see exactly these channel values back through the real codec
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (50 << 16) | (60 << 8) | 70)
    img.setRGB(0, 1, (90 << 16) | (100 << 8) | 110)
    img.setRGB(1, 1, (130 << 16) | (140 << 8) | 150)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val s = decodeImageStats(out.toByteArray)
    assert(s.width === 2 && s.height === 2 && s.channels === 3)
    assert(s.meanR === (10 + 50 + 90 + 130) / 4.0)
    assert(s.meanG === (20 + 60 + 100 + 140) / 4.0)
    assert(s.meanB === (30 + 70 + 110 + 150) / 4.0)
  }

  test("synthPng round-trips its pixel formula through a REAL PNG encode/decode") {
    val (id, w, h) = (42L, 13, 9)
    val s = decodeImageStats(synthPng(id, w, h))
    def mean(f: (Int, Int) => Long): Double =
      (for { y <- 0 until h; x <- 0 until w } yield f(x, y)).sum.toDouble / (w * h)
    assert(s.width === w && s.height === h)
    assert(s.meanR === mean((x, y) => (id * 31 + x * 7 + y * 13) % 256))
    assert(s.meanG === mean((x, y) => (id * 17 + x * 3 + y * 5) % 256))
    assert(s.meanB === mean((x, y) => (id * 11 + x + y) % 256))
  }

  test("undecodable image bytes throw instead of skewing the batch") {
    val e = intercept[IllegalArgumentException](decodeImageStats(Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("undecodable image"))
  }

  test("REAL WAV decode: synthWav PCM round-trips format, frames, mean |sample|") {
    val (id, n) = (7L, 480)
    val s = decodeWavStats(synthWav(id, n, sampleRateHz = 8000))
    assert(s.sampleRateHz === 8000 && s.channels === 1 && s.bitsPerSample === 16)
    assert(s.numFrames === n.toLong)
    val expect = (0 until n).map(i => math.abs(((id * 7919 + i.toLong * 31) % 65536) - 32768)).sum.toDouble / n
    assert(s.meanAbs === expect)
  }

  test("ImageIoDecoder plugs into the per-partition decode path") {
    import spark.implicits._
    implicit val s = spark
    val rows = Seq(
      MediaRow(1L, synthPng(1L, 4, 4), MediaMeta("image", 4, 4, 0, 0L)),
      MediaRow(2L, synthPng(2L, 6, 3), MediaMeta("image", 6, 3, 0, 0L)))
    val feats = decodeFeatures(rows.toDS(), new ImageIoDecoder).collect()
      .map(f => f.doc_id -> f.features).toMap
    assert(feats(1L)(0) === 4.0f && feats(1L)(1) === 4.0f)
    assert(feats(2L)(0) === 6.0f && feats(2L)(7) === 2.0f) // aspect w/h
  }
}
