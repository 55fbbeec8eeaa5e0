package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns + a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run per partition so one
  * task touches many blobs without per-row JVM↔native round-trips.
  *
  * The actual codec step is STUBBED (no image/audio libraries exist in this
  * offline container): `StubDecoder` produces deterministic hash-derived
  * features, so every piece of Spark-side plumbing — schema, partitioning,
  * batch shape, persistence — is real and tested, and swapping in a real
  * decoder is a one-function change.
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

  /** STUB decoder — deterministic FNV-1a-derived pseudo-features standing in
    * for a real codec (none available offline). Same bytes ⇒ same features. */
  final class StubDecoder(val dim: Int = 8) extends Decoder {
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
