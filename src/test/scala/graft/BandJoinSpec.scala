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

  test("intervalContain matches brute force, half-open, exactly once") {
    val pts = (0L until 60L).map(i => (i, i * 7L % 101L)).toDF("pid", "pv")
    val ivs = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, 10L, 40L),
      (4L, 90L, 120L), (5L, 50L, 51L), (6L, 30L, 30L))
      .toDF("iid", "s", "e")
    val got = BandJoin.intervalContain(pts, ivs, "pv", "s", "e", 8L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val want = pts.crossJoin(ivs)
      .filter(col("pv") >= col("s") && col("pv") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(got.sameElements(want))
    // empty interval (e <= s, iid 2 and 6) never matches
    assert(!want.exists(p => p._2 == 2L || p._2 == 6L))
    // exactly-once under the multi-bucket interval replication
    assert(got.distinct.length === got.length)
  }

  test("intervalContain raises on an interval spanning too many buckets") {
    val pts = Seq((1L, 5L)).toDF("pid", "pv")
    val ivs = Seq((1L, 0L, 100L)).toDF("iid", "s", "e")
    val e = intercept[Exception](
      BandJoin.intervalContain(pts, ivs, "pv", "s", "e", 10L,
        maxBucketsPerInterval = 4).collect())
    assert(e.getMessage.contains("spans more than"),
      s"expected the bucket-span guard, got: ${e.getMessage}")
  }

  test("property: random key sets and radii match brute force (scalacheck)") {
    import org.scalacheck.Gen
    val keysGen = for {
      n <- Gen.chooseNum(1, 60)
      ks <- Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L))
    } yield ks
    val radiusGen = Gen.chooseNum(1L, 5000L)
    for (trial <- 1 to 12) {
      val lv = keysGen.sample.getOrElse(List(0L))
      val rv = keysGen.sample.getOrElse(List(1L))
      val radius = radiusGen.sample.getOrElse(17L)
      val l = lv.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("lid", "lv")
      val r = rv.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("rid", "rv")
      val got = BandJoin.band(l, r, "lv", "rv", radius)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted
      // driver-side brute force — independent of Spark's join machinery
      val want = (for {
        (a, i) <- lv.zipWithIndex
        (b, j) <- rv.zipWithIndex
        if math.abs(a - b) <= radius
      } yield (i.toLong, j.toLong)).sorted
      assert(got.toSeq == want,
        s"trial $trial radius=$radius: got ${got.length} want ${want.length}")
    }
  }

  test("property: random intervals and points match brute force (scalacheck)") {
    import org.scalacheck.Gen
    val ptsGen = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5000L, 5000L)))
    val ivGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, for {
        s <- Gen.chooseNum(-5000L, 5000L)
        len <- Gen.chooseNum(0L, 900L) // includes empty intervals
      } yield (s, s + len)))
    for (trial <- 1 to 10) {
      val pv = ptsGen.sample.getOrElse(List(0L))
      val iv = ivGen.sample.getOrElse(List((0L, 10L)))
      val width = Gen.chooseNum(1L, 400L).sample.getOrElse(50L)
      val p = pv.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "pv")
      val i = iv.zipWithIndex.map { case ((s, e), j) => (j.toLong, s, e) }
        .toDF("iid", "s", "e")
      val got = BandJoin.intervalContain(p, i, "pv", "s", "e", width)
        .select("pid", "iid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted
      val want = (for {
        (v, pi) <- pv.zipWithIndex
        ((s, e), ii) <- iv.zipWithIndex
        if v >= s && v < e
      } yield (pi.toLong, ii.toLong)).sorted
      assert(got.toSeq == want,
        s"trial $trial width=$width: got ${got.length} want ${want.length}")
    }
  }

  test("intervalOverlap: property — random interval sets match brute force") {
    import org.scalacheck.Gen
    val ivGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, for {
        s <- Gen.chooseNum(-5000L, 5000L)
        len <- Gen.chooseNum(0L, 900L) // includes empty intervals
      } yield (s, s + len)))
    for (trial <- 1 to 10) {
      val av = ivGen.sample.getOrElse(List((0L, 10L)))
      val bv = ivGen.sample.getOrElse(List((5L, 15L)))
      val width = Gen.chooseNum(1L, 400L).sample.getOrElse(50L)
      val a = av.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("aid", "as", "ae")
      val b = bv.zipWithIndex.map { case ((s, e), j) => (j.toLong, s, e) }
        .toDF("bid", "bs", "be")
      val got = BandJoin.intervalOverlap(a, b, "as", "ae", "bs", "be", width)
        .select("aid", "bid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted
      val want = (for {
        ((s1, e1), i) <- av.zipWithIndex
        ((s2, e2), j) <- bv.zipWithIndex
        // true half-open overlap: the intersection [max(s), min(e))
        // must be non-empty — the bare s1<e2 && s2<e1 predicate is a
        // LIE for empty intervals like [5,5) vs [4,6)
        if e1 > s1 && e2 > s2 && s1 < e2 && s2 < e1
      } yield (i.toLong, j.toLong)).sorted
      assert(got.toSeq == want,
        s"trial $trial width=$width: got ${got.length} want ${want.length}")
    }
  }

  test("intervalOverlap produces each overlapping pair exactly once") {
    // long intervals sharing MANY buckets — the greatest(start)-bucket
    // dedup rule must still emit one row per pair
    val a = Seq((1L, 0L, 4000L), (2L, 100L, 3900L)).toDF("aid", "as", "ae")
    val b = Seq((1L, 50L, 3500L), (2L, 3999L, 8000L)).toDF("bid", "bs", "be")
    val rows = BandJoin.intervalOverlap(a, b, "as", "ae", "bs", "be", 10L)
      .groupBy("aid", "bid").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows == Map((1L, 1L) -> 1L, (1L, 2L) -> 1L, (2L, 1L) -> 1L),
      s"got $rows") // (2L,2L): interval 2 of a ends at 3900 < 3999 start
  }

  test("q262 plans an equi shuffle join on the bucket, never a cartesian") {
    val plan = SparkEntry.queries("q262_temporal_band_join")(
      spark, "/root/testdata/sf0.001").queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band join must not plan a pair scan:\n$plan")
  }
}
