package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GridDbscan

/** GridDbscan.classify: exact ε-neighbourhood counts and the
  * core/border/noise triage against a brute-force reference, including
  * negative coordinates (floor-vs-truncate cell edge) and points
  * exactly at distance eps. */
class GridDbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ref(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : Map[Long, (Long, String)] = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val nn = pts.map(p =>
      p._1 -> pts.count(q => q._1 != p._1 && near(p, q)).toLong).toMap
    val core = pts.filter(p => nn(p._1) + 1 >= minPts).map(_._1).toSet
    pts.map { p =>
      val cls =
        if (core(p._1)) "core"
        else if (pts.exists(q => core(q._1) && q._1 != p._1 && near(p, q)))
          "border"
        else "noise"
      p._1 -> (nn(p._1), cls)
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : Map[Long, (Long, String)] =
    GridDbscan.classify(pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4)))
      .toMap

  test("hand case: dense blob is core, satellite is border, far point noise") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L), // blob
      (5L, 4L, 0L), // within eps=3 of the blob edge, not dense
      (6L, 100L, 100L)) // noise
    val got = run(pts, eps = 3L, minPts = 4)
    assert(got(1L)._2 == "core" && got(4L)._2 == "core")
    assert(got(5L)._2 == "border")
    assert(got(6L) == (0L, "noise"))
    assert(got == ref(pts, 3L, 4))
  }

  test("distance exactly eps counts as a neighbour (≤, not <)") {
    val pts = Seq((1L, 0L, 0L), (2L, 5L, 0L), (3L, 0L, 5L))
    val got = run(pts, eps = 5L, minPts = 3)
    assert(got(1L) == (2L, "core"))
    assert(got(2L)._1 == 1L && got(2L)._2 == "border")
  }

  test("property: random clouds (negative coords, cross-cell pairs) match brute force") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(80)
      val pts = (1L to n.toLong).map(i =>
        (i, rnd.between(-50L, 50L), rnd.between(-50L, 50L)))
      val eps = 5L + rnd.nextInt(10)
      val minPts = 2 + rnd.nextInt(4)
      assert(run(pts, eps, minPts) == ref(pts, eps, minPts),
        s"trial $trial eps=$eps minPts=$minPts")
    }
  }
}
