package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream PURE non-equi band join — the streaming twin of
  * [[graft.operators.BandJoin.band]]: pair left and right events whose
  * event times lie within `radiusSeconds` of each other, with NO equi
  * key at all ("every purchase against every click within ±30 min,
  * across ALL users", continuously).
  *
  * Why the bucket decomposition matters MORE here than in batch: a
  * stream-stream join's symmetric-hash state is partitioned by the
  * join's equality keys. With only a time-range predicate there is no
  * equality key — every row of both streams lands in ONE state
  * partition and one task owns the whole join. Deriving the
  * `radius`-wide bucket id (right rows once, left rows replicated to
  * the 3 covering buckets — the batch operator's algebra, so each true
  * pair matches in exactly one bucket) gives Spark a real equi key:
  * state shards across the cluster by bucket, and the time-range
  * condition still bounds both sides' state via the watermark (rows
  * evict once the opposing watermark passes their bucket's reach).
  *
  * Inner-join semantics: pairs emit as soon as both sides have
  * arrived (append mode); a pair can never be revised, so no
  * finalization wait — the spec asserts exact parity with the batch
  * operator on the same data.
  */
object StreamingBandJoin {

  /** Band-join two watermarked streams on |leftTs − rightTs| ≤
    * `radiusSeconds`. Column names must be disjoint (rename first);
    * both `leftTs`/`rightTs` must be TimestampType (or NTZ) columns.
    * `watermark` bounds late data AND join state on both sides. */
  def band(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, radiusSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    require(radiusSeconds > 0, "radiusSeconds must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint; overlapping: ${overlap.mkString(", ")}")
    val radiusUs = radiusSeconds * 1000000L
    // the batch operator's shifted floor-division bucket, exact BIGINT
    def bucketOf(c: String): Column =
      expr(s"(unix_micros(cast($c as timestamp)) + ${Long.MaxValue / 2}) " +
        s"div $radiusUs")
    val l = left.withWatermark(leftTs, watermark)
      .withColumn("__band_off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__band_bucket_l", bucketOf(leftTs) + col("__band_off"))
      .drop("__band_off")
    val r = right.withWatermark(rightTs, watermark)
      .withColumn("__band_bucket_r", bucketOf(rightTs))
    // the time bounds must live IN the join condition (not a filter
    // after it) — they are what lets Spark derive each side's state
    // eviction horizon from the other side's watermark
    val iv = s"INTERVAL $radiusSeconds SECONDS"
    l.join(r,
        col("__band_bucket_l") === col("__band_bucket_r") &&
          col(rightTs) >= col(leftTs) - expr(iv) &&
          col(rightTs) <= col(leftTs) + expr(iv))
      .drop("__band_bucket_l", "__band_bucket_r")
  }
}
