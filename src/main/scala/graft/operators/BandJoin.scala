package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure NON-EQUI band join: pair left and right rows whose numeric
  * keys lie within `radius` of each other — |l − r| ≤ radius — with no
  * equi-key at all. The temporal-proximity workhorse ("events within
  * ±5 minutes of each other, across ALL users"): Spark has no banded
  * range-join strategy, so the naive predicate plans as a
  * BroadcastNestedLoopJoin or cartesian — |L|·|R| comparisons, dead at
  * scale. (q14_range_join is the OTHER range-join class: a theta
  * predicate riding a real equi key, which hash-joins fine.)
  *
  * Bucket decomposition turns it into one equi shuffle: right rows
  * land in bucket ⌊r/radius⌋ (exactly one each); left rows replicate
  * to the 3 buckets ⌊l/radius⌋ − 1 .. + 1, which COVER every value
  * within ±radius (a match m of l has ⌊m/radius⌋ ∈ that window);
  * equi-join on the bucket id, then the exact |l − r| ≤ radius filter.
  * Each true pair is produced exactly once (the right row exists in
  * one bucket). Cost: a 3× replication of the LEFT side and pair work
  * bounded by per-bucket density — the skew knob is the radius itself,
  * and bucket-count observability comes free via a groupBy on
  * `__band_bucket` before joining.
  *
  * At 100 TB the shuffle keys are (bucket: LONG), the join is a plain
  * shuffled hash join Catalyst already knows how to partition, and a
  * hot bucket (a traffic spike within one radius window) is visible in
  * the bucket histogram and salts like any other skewed equi key
  * (SkewJoin).
  */
object BandJoin {

  /** Band-join `left` and `right` on |leftOn − rightOn| ≤ radius.
    * Column NAMES must be disjoint between the two frames (rename
    * before calling — the result carries all columns of both sides).
    * `leftOn`/`rightOn` must be integral (cast timestamps with
    * unix_micros/unix_millis first); `radius` must be positive. */
  def band(left: DataFrame, right: DataFrame,
      leftOn: String, rightOn: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint; overlapping: ${overlap.mkString(", ")}")
    // floor division that is also correct for negative keys (Spark's
    // `div` truncates toward zero; shifting into the positive range
    // avoids the special case). Pure BIGINT — no double round-trip,
    // which would lose exactness once key + offset exceeds 2^53.
    def bucketOf(colName: String): Column =
      expr(s"(cast($colName as bigint) + ${Long.MaxValue / 2}) div $radius")
    val r = right.withColumn("__band_bucket", bucketOf(rightOn))
    val l = left
      .withColumn("__band_off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__band_bucket",
        bucketOf(leftOn) + col("__band_off"))
      .drop("__band_off")
    l.join(r, Seq("__band_bucket"))
      .filter(abs(col(leftOn) - col(rightOn)) <= radius)
      .drop("__band_bucket")
  }

  /** Interval CONTAINMENT join: pair each point row with every
    * interval row whose half-open [start, end) contains it — again
    * with no equi key (the "which sessions were active at this
    * moment" join). Points land in one `bucketWidth` bucket; each
    * interval replicates to the ⌈len/width⌉+1 buckets it spans, so
    * replication is bounded by interval length — `maxBucketsPerInterval`
    * guards the degenerate open-ended interval (exceeding it raises at
    * execution rather than silently exploding the shuffle). Pairs are
    * exact (the point exists in one bucket) and produced exactly once.
    * Pick `bucketWidth` near the TYPICAL interval length: shorter
    * widths shrink per-bucket pair work but add interval copies. */
  def intervalContain(points: DataFrame, intervals: DataFrame,
      pointOn: String, startOn: String, endOn: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint; overlapping: ${overlap.mkString(", ")}")
    def bucketSql(colName: String): String =
      s"(cast($colName as bigint) + ${Long.MaxValue / 2}) div $bucketWidth"
    val p = points.withColumn("__band_bucket", expr(bucketSql(pointOn)))
    val i = intervals
      .withColumn("__band_bucket", explode(expr(
        s"""CASE
           |  WHEN $endOn <= $startOn THEN array()
           |  WHEN ${bucketSql(endOn)} - ${bucketSql(startOn)}
           |      >= $maxBucketsPerInterval
           |    THEN raise_error(concat('BandJoin.intervalContain: interval spans more than $maxBucketsPerInterval buckets at ', cast($startOn as string)))
           |  ELSE sequence(${bucketSql(startOn)}, ${bucketSql(endOn)})
           |END""".stripMargin)))
    p.join(i, Seq("__band_bucket"))
      .filter(col(pointOn) >= col(startOn) && col(pointOn) < col(endOn))
      .drop("__band_bucket")
  }

  /** Interval OVERLAP join: pair every left interval [ls, le) with
    * every right interval [rs, re) that overlaps it — ls < re AND
    * rs < le — the third non-equi class (band = point×point,
    * containment = point×interval, this = interval×interval; the
    * "whose sessions were open at the same time" join). Both sides
    * replicate to every `bucketWidth` bucket they span; overlapping
    * intervals share the bucket of any common instant, so one equi
    * shuffle on the bucket id finds all pairs. Because a pair can
    * share MANY buckets, each pair is kept only in the bucket of
    * `greatest(ls, rs)` — the first instant of the intersection,
    * which both intervals contain — so output is exactly-once
    * WITHOUT a distinct (no second shuffle). Replication is bounded
    * by interval length via `maxBucketsPerInterval` on both sides,
    * same guard as [[intervalContain]]. Empty intervals (end ≤
    * start) join nothing. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be disjoint; overlapping: ${overlap.mkString(", ")}")
    def bucketSql(colName: String): String =
      s"(cast($colName as bigint) + ${Long.MaxValue / 2}) div $bucketWidth"
    def spanBuckets(startOn: String, endOn: String): Column =
      explode(expr(
        s"""CASE
           |  WHEN $endOn <= $startOn THEN array()
           |  WHEN ${bucketSql(endOn)} - ${bucketSql(startOn)}
           |      >= $maxBucketsPerInterval
           |    THEN raise_error(concat('BandJoin.intervalOverlap: interval spans more than $maxBucketsPerInterval buckets at ', cast($startOn as string)))
           |  ELSE sequence(${bucketSql(startOn)}, ${bucketSql(endOn)})
           |END""".stripMargin))
    val l = left.withColumn("__band_bucket", spanBuckets(leftStart, leftEnd))
    val r = right.withColumn("__band_bucket", spanBuckets(rightStart, rightEnd))
    l.join(r, Seq("__band_bucket"))
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("__band_bucket") ===
        expr(s"(cast(greatest($leftStart, $rightStart) as bigint) + ${Long.MaxValue / 2}) div $bucketWidth"))
      .drop("__band_bucket")
  }
}
