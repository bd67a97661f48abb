package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in bounded batches.
  *
  * The actual media decode is STUBBED (deterministic fake — this
  * environment ships no image/audio codecs); everything around it — the
  * schema contract, partition-parallel execution, batch shape, feature
  * vector layout — is the real 100 TB-shaped pipeline: binary payloads
  * never touch the driver, decode runs inside mapPartitions with a
  * fixed-size row group per call, and output is a flat feature struct
  * that downstream similarity operators consume directly.
  */
object Multimodal {

  /** Resize target box shared by [[resizePlan]]'s defaults and the q63
    * oracle SQL — interpolated into both so changing it cannot desync
    * engine and oracle. */
  val DefaultResizeBox = 224

  /** A media row: opaque bytes + metadata (mime drives the decode path). */
  final case class MediaRow(media_id: Long, mime: String, content: Array[Byte])

  /** Extracted features: deterministic stand-ins for decode outputs. */
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      embedding: Array[Float])

  /** STUB decode — replace with a real codec in production. Deterministic
    * in the content bytes so tests and retries agree, and derived from a
    * sha256 prefix (== CAST('0x' || substr(sha256(c), 1, 8) AS BIGINT))
    * so an external SQL oracle can hash-check every metadata field. */
  private[operators] def stubDecode(row: MediaRow): MediaFeatures = {
    val n = row.content.length
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(row.content)
    // uint32 of the first 4 digest bytes (non-negative, no abs needed)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val dim = 16
    val emb = Array.tabulate(dim) { i =>
      // cheap keyed hash → [-1, 1): fake embedding, stable per content
      val x = (h * 31 + i * 2654435761L).toInt
      (x.toFloat / Int.MaxValue.toFloat)
    }
    val isVideo = row.mime.startsWith("video/")
    MediaFeatures(row.media_id, row.mime, n,
      width = if (n == 0) 0 else (64 + h % 577).toInt,
      height = if (n == 0) 0 else (64 + (h / 7) % 433).toInt,
      n_frames = if (isVideo) (1 + h % 240).toInt else 1,
      embedding = emb)
  }

  /** Feature extraction over binary media: partition-parallel, batched.
    * `batchSize` bounds per-call memory (decoded frames never accumulate
    * beyond one batch per task). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.map(stubDecode) }
    }
  }

  /** Resize planning: target dimensions that fit a `maxW`×`maxH` box
    * preserving aspect ratio (never upscaled, floor 1px). Pure column
    * arithmetic over the decoded metadata — the pixel resample itself
    * belongs behind the codec seam ([[stubDecode]]); this computes the
    * plan every real resampler needs, identically in SQL for the oracle. */
  def resizePlan(features: DataFrame, maxW: Int = DefaultResizeBox,
      maxH: Int = DefaultResizeBox): DataFrame = {
    val zero = col("width") === 0 || col("height") === 0
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    features
      .withColumn("scale", when(zero, lit(0.0)).otherwise(scale))
      .withColumn("out_w", when(zero, lit(0))
        .otherwise(greatest(lit(1), round(col("width") * col("scale"))
          .cast("int"))))
      .withColumn("out_h", when(zero, lit(0))
        .otherwise(greatest(lit(1), round(col("height") * col("scale"))
          .cast("int"))))
  }

  /** Frame sampling for video rows: every `stride`-th synthetic frame
    * index (the real implementation would seek in the container). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int = 30)(
      implicit spark: SparkSession): DataFrame = {
    features.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))))
      .select("media_id", "mime", "frame_idx")
  }

  /** Wrap documents' text bytes as a media table (test/bench harness:
    * gives the binary pipeline real distributed input without shipping
    * actual media). */
  def mediaFromDocuments(docs: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    // Spread.byKey before the per-row decode: a single-split corpus
    // would otherwise run every decode on one core — the whole point of
    // the mapPartitions shape is one decoder per task
    Spread.byKey(docs, col("doc_id"))
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, lit("image/png"))
          .when(col("doc_id") % 3 === 1, lit("audio/wav"))
          .otherwise(lit("video/mp4")).as("mime"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
  }
}
