package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WlRefinement

/** WlRefinement: structural-distinguishability semantics on hand-built
  * graphs — symmetric positions keep equal labels, asymmetric ones
  * split, refinement is monotone (a split never re-merges), and
  * isolated nodes survive. */
class WlRefinementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map { case (a, b) => (b, a) }).toDF("src", "dst")

  private def run(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] =
    WlRefinement.relabel(sym(edges), labels.toDF("node", "lbl"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def degrees(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val s = edges ++ edges.map { case (a, b) => (b, a) }
    s.groupBy(_._1).map { case (v, l) => v -> l.size.toLong }.toSeq
  }

  test("path P4: ends match ends, middles match middles, across rounds") {
    // 0—1—2—3: {0,3} and {1,2} are the orbits
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val wl = run(e, degrees(e), rounds = 2)
    assert(wl(0L) === wl(3L))
    assert(wl(1L) === wl(2L))
    assert(wl(0L) !== wl(1L))
  }

  test("star center splits from leaves on round one") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val wl = run(e, degrees(e), rounds = 1)
    assert(wl(1L) === wl(2L) && wl(2L) === wl(3L))
    assert(wl(0L) !== wl(1L))
  }

  test("cycle C6 stays uniform (vertex-transitive graph never splits)") {
    val e = (0L until 6L).map(i => (i, (i + 1) % 6))
    val wl = run(e, degrees(e), rounds = 3)
    assert(wl.values.toSet.size === 1)
  }

  test("radius matters: P5 middle vs ends-adjacent need two rounds") {
    // 0—1—2—3—4: after 1 round 1,2,3 all see (deg2 | sorted nbr degs)
    // with nbr multisets {1,2},{2,2},{2,1} → 1,3 match, 2 differs only
    // at round ≥ 2? Round 1 already splits 2 from 1,3 ({2,2} vs {1,2}).
    // What needs round 2 is nothing here — instead assert monotonicity:
    // the partition only refines.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val d = degrees(e)
    val p1 = run(e, d, 1).groupBy(_._2).values.map(_.keys.toSet).toSet
    val p2 = run(e, d, 2).groupBy(_._2).values.map(_.keys.toSet).toSet
    // every round-2 class is contained in some round-1 class
    assert(p2.forall(c2 => p1.exists(c1 => c2.subsetOf(c1))))
    assert(p2.size >= p1.size)
  }

  test("node with a label but no edges keeps re-hashing alone") {
    val wl = run(Seq((0L, 1L)),
      Seq(0L -> 1L, 1L -> 1L, 9L -> 7L), rounds = 2)
    assert(wl.contains(9L))
    // 9's label differs from the connected pair's
    assert(wl(9L) !== wl(0L))
  }

  test("different seed labels propagate: labeled graph splits a cycle") {
    val e = (0L until 4L).map(i => (i, (i + 1) % 4))
    // mark node 0 with a distinct seed: neighbors 1,3 must split from 2
    val seeds = Seq(0L -> 99L, 1L -> 1L, 2L -> 1L, 3L -> 1L)
    val wl = run(e, seeds, rounds = 1)
    assert(wl(1L) === wl(3L))
    assert(wl(1L) !== wl(2L))
    assert(wl(0L) !== wl(2L))
  }
}
