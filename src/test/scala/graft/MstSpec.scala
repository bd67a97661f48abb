package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mst

/** Mst: Borůvka's forest against a driver-side Kruskal union-find
  * under the identical (w, u, v) total order — exact edge-set equality
  * (the composite-order forest is unique), plus shape cases: path,
  * cycle, disconnected forest, tied weights, duplicate edge rows. */
class MstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Mst.forest(edges.toDF("u", "v", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  /** Driver-side Kruskal with path-compressed union-find, same
    * canonicalization and (w, u, v) tie-break. */
  private def brute(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.map { case (a, b, w) =>
      (math.min(a, b), math.max(a, b), w) }.filter(e => e._1 != e._2)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((u, v, w) <- canon.sortBy { case (u, v, w) => (w, u, v) }) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.toSet
  }

  test("path graph keeps every edge") {
    val es = (0L until 5L).map(i => (i, i + 1, 10L + i))
    assert(run(es) == es.toSet)
  }

  test("cycle drops exactly the heaviest edge") {
    val es = Seq((0L, 1L, 5L), (1L, 2L, 3L), (2L, 3L, 9L), (3L, 0L, 4L))
    assert(run(es) == Set((0L, 1L, 5L), (1L, 2L, 3L), (0L, 3L, 4L)))
  }

  test("disconnected graph yields a forest per component") {
    val es = Seq((0L, 1L, 1L), (1L, 2L, 2L), (0L, 2L, 3L),
      (10L, 11L, 1L), (11L, 12L, 5L), (10L, 12L, 4L))
    val got = run(es)
    assert(got == brute(es))
    assert(got.size == 4) // 3 nodes → 2 edges, twice
  }

  test("tied weights resolve by (u, v) and match Kruskal") {
    val es = Seq((0L, 1L, 7L), (1L, 2L, 7L), (2L, 0L, 7L),
      (2L, 3L, 7L), (3L, 0L, 7L))
    assert(run(es) == brute(es))
  }

  test("duplicate and reversed edge rows are tolerated") {
    val es = Seq((1L, 0L, 2L), (0L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L),
      (0L, 2L, 3L))
    assert(run(es) == Set((0L, 1L, 2L), (1L, 2L, 1L)))
  }

  test("random graphs match driver Kruskal exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 20 + trial * 15
      val es = (1 to n * 3).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          (rnd.nextInt(50) + 1).toLong)
      }.filter(e => e._1 != e._2)
      assert(run(es) == brute(es), s"trial $trial")
    }
  }

  test("long chain contraction converges (pointer-jump depth)") {
    // A single path of 60 nodes with descending weights forces long
    // selection chains inside one Borůvka round.
    val es = (0L until 60L).map(i => (i, i + 1, 1000L - i))
    assert(run(es) == es.toSet)
  }

  test("maxRounds exhausted with cross-component edges remaining throws") {
    // {0,1} and {2,3} merge in round 1; the (1,2) bridge needs round 2.
    val es = Seq((0L, 1L, 1L), (2L, 3L, 1L), (1L, 2L, 10L))
    val ex = intercept[IllegalStateException] {
      Mst.forest(es.toDF("u", "v", "w"), maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("maxRounds=1 exhausted"))
    // Two rounds suffice — same graph, cap 2, full forest.
    assert(run(es) == Set((0L, 1L, 1L), (1L, 2L, 10L), (2L, 3L, 1L)))
  }

  test("a cap met exactly at convergence does not throw") {
    // The descending chain contracts fully in ONE round; with
    // maxRounds=1 the loop exits done=false but no cross edge remains.
    val es = (0L until 10L).map(i => (i, i + 1, 1000L - i))
    val got = Mst.forest(es.toDF("u", "v", "w"), maxRounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == es.toSet)
  }
}
