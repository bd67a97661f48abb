package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

/** Skyline.maxMax: dominance semantics (ties, strictness) against a
  * brute-force reference on random point sets, plus shard-boundary
  * edge cases. */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refSkyline(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (id, d1, d2) =>
      pts.exists { case (qid, q1, q2) =>
        qid != id && q1 >= d1 && q2 >= d2 && (q1 > d1 || q2 > d2)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline.maxMax(pts.toDF("id", "d1", "d2"), "id", "d1", "d2")
      .filter("is_skyline").collect().map(_.getLong(0)).toSet

  test("hand case: ties on d1 and d2, full duplicates coexist") {
    // (1,10,1) and (2,10,5): 2 dominates 1 (equal d1, greater d2).
    // (3,10,5): duplicate of 2 — neither dominates, both skyline.
    // (4,3,9) skyline; (5,3,8) dominated by 4; (6,12,0) skyline.
    val pts = Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 5L),
      (4L, 3L, 9L), (5L, 3L, 8L), (6L, 12L, 0L))
    assert(run(pts) == Set(2L, 3L, 4L, 6L))
    assert(run(pts) == refSkyline(pts))
  }

  test("single point and identical points are all skyline") {
    assert(run(Seq((1L, 5L, 5L))) == Set(1L))
    val dup = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 5L))
    assert(run(dup) == Set(1L, 2L, 3L))
  }

  test("constant d1 (zero range → single shard) degrades cleanly") {
    val pts = Seq((1L, 7L, 1L), (2L, 7L, 2L), (3L, 7L, 3L))
    assert(run(pts) == Set(3L))
  }

  test("property: random point sets match brute force") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 30 + rnd.nextInt(120)
      // small value domain forces shard-boundary and tie collisions
      val dom = if (trial % 2 == 0) 12L else 100000L
      val pts = (1L to n.toLong).map(i =>
        (i, rnd.between(-dom / 2, dom / 2), rnd.between(-dom / 2, dom / 2)))
      assert(run(pts) == refSkyline(pts), s"trial $trial")
    }
  }
}
