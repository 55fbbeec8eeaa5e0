package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns + a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run per partition so one
  * task touches many blobs without per-row JVM↔native round-trips.
  *
  * Decoding is REAL where the JDK ships a codec offline: PNG/JPEG through
  * `javax.imageio` ([[decodeImageStats]], [[ImageIoDecoder]]) and WAV/PCM
  * through `javax.sound.sampled` ([[decodeWavStats]]). [[HashDecoder]]
  * remains as the deterministic stand-in for container formats with no
  * offline codec (video keyframes, compressed audio) — plumbing identical,
  * decode function swappable.
  */
object Multimodal {

  /** Typed media metadata carried beside the blob. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRateHz: Int, durationMs: Long)

  final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                                 features: Array[Float])

  /** Decoder contract: bytes + meta → fixed-width feature vector. Real
    * implementations (JPEG decode, mel spectrogram, …) plug in here. */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(media: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** Deterministic FNV-1a-derived pseudo-features — the stand-in for
    * container formats with no offline codec (video, compressed audio).
    * Same bytes ⇒ same features. */
  final class HashDecoder(val dim: Int = 8) extends Decoder {
    def decode(media: Array[Byte], meta: MediaMeta): Array[Float] = {
      var h = 1469598103934665603L
      val out = new Array[Float](dim)
      var i = 0
      while (i < media.length) {
        h = (h ^ (media(i) & 0xffL)) * 1099511628211L
        out(i % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  // ---- real image decode (javax.imageio — ships in the JDK) -------------

  /** Exact per-channel statistics of a decoded image. Means are doubles
    * over exact integer channel sums, so an oracle recomputing the same
    * pixel function reproduces them bit-for-bit. */
  final case class ImageStats(width: Int, height: Int, channels: Int,
                              meanR: Double, meanG: Double, meanB: Double)

  /** REAL image decode: PNG/JPEG/BMP/GIF bytes → dimensions + channel
    * means, via the JDK's ImageIO. Throws IllegalArgumentException on
    * undecodable bytes — a corrupt blob must surface, not silently skew
    * the batch. */
  def decodeImageStats(media: Array[Byte]): ImageStats = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
    if (img == null) throw new IllegalArgumentException(
      s"undecodable image: no ImageIO reader matched ${media.length} bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageStats(w, h, img.getColorModel.getNumComponents,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Real-decode Decoder: fixed 8-wide feature vector from [[decodeImageStats]]
    * — (w, h, channels, meanR, meanG, meanB, luma, aspect). */
  final class ImageIoDecoder extends Decoder {
    val dim = 8
    def decode(media: Array[Byte], meta: MediaMeta): Array[Float] = {
      val s = decodeImageStats(media)
      Array(s.width.toFloat, s.height.toFloat, s.channels.toFloat,
        s.meanR.toFloat, s.meanG.toFloat, s.meanB.toFloat,
        (0.299 * s.meanR + 0.587 * s.meanG + 0.114 * s.meanB).toFloat,
        s.width.toFloat / s.height.toFloat)
    }
  }

  /** Deterministic RGB test image: pixel (x, y) of doc `id` has channels
    *   r = (id·31 + x·7 + y·13) mod 256
    *   g = (id·17 + x·3 + y·5) mod 256
    *   b = (id·11 + x + y) mod 256
    * encoded as a real PNG — the pixel function is trivially recomputable
    * in SQL, so a DuckDB oracle can assert the DECODED means. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((id * 11 + x + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ---- real audio decode (javax.sound.sampled — ships in the JDK) -------

  /** Exact statistics of a decoded PCM stream. */
  final case class WavStats(sampleRateHz: Int, channels: Int, bitsPerSample: Int,
                            numFrames: Long, meanAbs: Double)

  /** REAL audio decode: WAV bytes → format + frame count + mean |sample|
    * over 16-bit signed PCM, via the JDK's AudioSystem. */
  def decodeWavStats(media: Array[Byte]): WavStats = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(media))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
      val bytes = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      var sum = 0L; var i = 0
      while (i + 1 < bytes.length) {
        val s =
          if (bigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
          else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
        sum += math.abs(s.toLong)
        i += 2
      }
      val n = bytes.length / 2 / fmt.getChannels
      WavStats(fmt.getSampleRate.toInt, fmt.getChannels, 16, n.toLong,
        if (bytes.length < 2) 0.0 else sum.toDouble / (bytes.length / 2))
    } finally in.close()
  }

  /** Deterministic mono 16-bit PCM WAV: sample i of doc `id` is
    *   s(i) = ((id·7919 + i·31) mod 65536) − 32768
    * — recomputable in SQL for an oracle over the DECODED stream. */
  def synthWav(id: Long, numSamples: Int, sampleRateHz: Int = 16000): Array[Byte] = {
    val pcm = new Array[Byte](numSamples * 2)
    var i = 0
    while (i < numSamples) {
      val s = (((id * 7919 + i.toLong * 31) % 65536) - 32768).toShort
      pcm(2 * i) = (s & 0xff).toByte         // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, numSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Per-partition decode: one decoder instance per task, streaming over the
    * partition iterator — the batch shape a real codec wants (and the Scala
    * analog of a pandas-UDF `mapInPandas` batch). */
  def decodeFeatures(ds: Dataset[MediaRow], decoder: Decoder)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val feats = decoder.decode(r.media, r.meta)
        var h = 1469598103934665603L
        var i = 0
        while (i < r.media.length) { h = (h ^ (r.media(i) & 0xffL)) * 1099511628211L; i += 1 }
        MediaFeatures(r.doc_id, r.media.length.toLong, h, feats)
      }
    }
  }

  /** Frame sampling as a pure column expression: slice `n` fixed-width
    * frames at `stride` byte offsets out of the blob (the video-frame /
    * audio-window sampling shape; a real impl would slice at container
    * keyframe offsets instead). Stays in codegen — no UDF. */
  def sampleFrames(media: Column, n: Int, frameLen: Int, stride: Int): Column =
    filter(
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(media, (i * stride + 1).cast("int"), lit(frameLen))),
      f => octet_length(f) === frameLen)

  /** Cheap blob stats without decoding: size + xxhash64 checksum — the
    * dedup/partition key for binary content. */
  def withBlobStats(df: DataFrame, media: Column): DataFrame =
    df.withColumn("n_bytes", octet_length(media).cast("long"))
      .withColumn("blob_hash", xxhash64(media))

  /** "Resize" stub at the plumbing level: truncate/pad the blob to a target
    * byte budget (a real image resize changes pixels, not bytes — the point
    * here is the column-in/column-out shape and null-safety). */
  def resizeStub(media: Column, targetBytes: Int): Column =
    when(media.isNull, media)
      .when(octet_length(media) <= targetBytes, media)
      .otherwise(substring(media, 1, targetBytes))
}
