package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Triangles

/** Semantic tests of the triangle census — the q114 oracle gate proves
  * cross-engine equality on the KNN graph; these prove the wedge-join
  * enumeration on planted graphs, by hand. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Symmetrize an undirected edge list into the operator's contract
    * (both orientations, each exactly once). */
  private def sym(es: Seq[(Long, Long)]) =
    (es ++ es.map(_.swap)).toDF("src", "dst")

  test("K4 plus a pendant path counts triangles and lcc by hand") {
    // K4 on {0,1,2,3}, then 3–4, 4–5: vertices 0/1/2 sit in 3 triangles
    // with deg 3 (lcc = 1), 3 keeps its 3 triangles at deg 4
    // (lcc = 6/12), 4 bridges (deg 2, no triangle), 5 is a leaf, 6 is
    // isolated (never appears in an edge).
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Triangles.census((0L to 6L).toDF("id"), sym(und))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) === ((3L, 3L, 1.0)))
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 3L, 1.0)))
    assert(got(3L) === ((4L, 3L, 0.5)))
    assert(got(4L) === ((2L, 0L, 0.0)))
    assert(got(5L) === ((1L, 0L, 0.0)))
    assert(got(6L) === ((0L, 0L, 0.0)))
  }

  test("a triangle-free bipartite graph reports zero everywhere") {
    // C4: 0–1, 1–2, 2–3, 3–0 — every vertex has deg 2, no triangles.
    val got = Triangles.census((0L to 3L).toDF("id"),
        sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r._2 === 2L); assert(r._3 === 0L); assert(r._4 === 0.0)
    }
  }

  test("triangle totals: each triangle contributes exactly 3 vertex counts") {
    // two triangles sharing an edge: {0,1,2} and {1,2,3}
    val got = Triangles.census((0L to 3L).toDF("id"),
        sym(Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._3).sum === 6L) // 2 triangles × 3 vertices
    assert(got.find(_._1 == 1L).get._3 === 2L) // shared-edge vertices
    assert(got.find(_._1 == 3L).get._3 === 1L)
  }
}
