package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BandJoin

/** BandJoin: exact parity with the brute-force cross join on every
  * pair, boundary inclusion, negative keys (the shifted floor
  * division), exactly-once pair production under the 3-bucket left
  * replication, and the disjoint-columns contract. */
class BandJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the brute-force cross join exactly (incl. boundaries)") {
    // keys chosen to exercise: exact-boundary |d|==r, r+1 exclusion,
    // same-bucket, adjacent-bucket, and far-apart pairs
    val l = Seq(0L, 7L, 10L, 23L, -15L, 100L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
    val r = Seq(10L, 17L, -5L, -25L, 94L, 200L, 0L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
    val radius = 10L
    val got = BandJoin.band(l, r, "lv", "rv", radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .sorted
    val want = l.crossJoin(r)
      .filter(abs(col("lv") - col("rv")) <= radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .sorted
    assert(got.sameElements(want), s"got ${got.toSeq} want ${want.toSeq}")
    // sanity on the fixture itself: boundary pair present (0 vs 10 at
    // r=10), and the just-outside pair absent would fail above anyway
    assert(want.contains((0L, 0L)))
  }

  test("each matching pair is produced exactly once") {
    val l = (0L until 50L).map(i => (i, i * 3L)).toDF("lid", "lv")
    val r = (0L until 50L).map(i => (i, i * 4L)).toDF("rid", "rv")
    val pairs = BandJoin.band(l, r, "lv", "rv", 7L)
      .groupBy("lid", "rid").count()
    assert(pairs.filter(col("count") > 1).count() === 0,
      "bucket replication must not duplicate pairs")
  }

  test("negative and mixed-sign keys band correctly") {
    val l = Seq((1L, -1000003L), (2L, -3L), (3L, 5L)).toDF("lid", "lv")
    val r = Seq((1L, -1000000L), (2L, 2L), (3L, -999990L)).toDF("rid", "rv")
    val got = BandJoin.band(l, r, "lv", "rv", 6L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .sorted
    // -1000003 matches -1000000 (gap 3); -3 matches 2 (gap 5);
    // 5 matches 2 (gap 3); -999990 matches nothing (gap 13 to -1000003)
    assert(got.sameElements(Seq((1L, 1L), (2L, 2L), (3L, 2L))))
  }

  test("overlapping column names are rejected") {
    val l = Seq((1L, 2L)).toDF("id", "v")
    val r = Seq((1L, 2L)).toDF("id", "w")
    val e = intercept[IllegalArgumentException](
      BandJoin.band(l, r, "v", "w", 5L))
    assert(e.getMessage.contains("disjoint"))
  }

  test("q262 plans an equi shuffle join on the bucket, never a cartesian") {
    val plan = SparkEntry.queries("q262_temporal_band_join")(
      spark, "/root/testdata/sf0.001").queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band join must not plan a pair scan:\n$plan")
  }
}
