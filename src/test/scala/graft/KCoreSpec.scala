package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KCore

/** KCore: recursive-peel semantics (a high-degree node supported only
  * by peeled nodes must fall out), clique stability, empty cores,
  * symmetry preservation, and the brute-force parity property. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map { case (a, b) => (b, a) }).toDF("src", "dst")

  /** Reference peel on the driver, for parity checks. */
  private def bruteCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = (edges ++ edges.map { case (a, b) => (b, a) }).distinct
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (v, l) => v -> l.size }
      val keep = deg.filter(_._2 >= k).keySet
      val nxt = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = nxt.size != es.size
      es = nxt
    }
    es.groupBy(_._1).map { case (v, l) => v -> l.size }
  }

  test("triangle survives a 2-core peel, the tail does not") {
    // triangle 1-2-3 + tail 3-4-5 + isolated edge 6-7
    val nodes = KCore.coreNodes(
        sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))),
        k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nodes == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("recursive support: degree-k node backed by peeled nodes falls out") {
    // star center 0 with leaves 1..3 has raw degree 3, but every leaf
    // has degree 1 — after the leaves peel, the center must too
    val core = KCore.coreEdges(sym(Seq((0L, 1L), (0L, 2L), (0L, 3L))), k = 2)
    assert(core.count() === 0L)
  }

  test("a k+1 clique is its own k-core (fixpoint on round one)") {
    val clique = for {
      a <- 0L until 5L; b <- 0L until 5L if a < b
    } yield (a, b)
    val nodes = KCore.coreNodes(sym(clique.toSeq), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nodes == (0L until 5L).map(_ -> 4L).toMap)
  }

  test("surviving edge set stays symmetric") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L))
    val core = KCore.coreEdges(sym(es), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core.map(_.swap) == core)
  }

  test("property: random graphs match the brute-force peel (k=2,3)") {
    import org.scalacheck.Gen
    val edgeGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 24L)
        b <- Gen.chooseNum(0L, 24L) if a != b
      } yield if (a < b) (a, b) else (b, a)))
    for (trial <- 1 to 6; k <- Seq(2, 3)) {
      val es = edgeGen.sample.getOrElse(List((0L, 1L))).distinct
      val got = KCore.coreNodes(sym(es), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val want = bruteCore(es, k)
      assert(got == want, s"trial $trial k=$k edges=$es")
    }
  }

  test("maxIter guard raises instead of returning a partial peel") {
    val e = intercept[IllegalStateException](
      KCore.coreEdges(sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
        (4L, 5L))), k = 2, maxIter = 1))
    assert(e.getMessage.contains("did not converge"))
  }
}
