package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Closure

/** Closure: path-doubling transitive closure against a brute-force
  * Floyd–Warshall reference, SCC ids on mixed cyclic/acyclic graphs,
  * condensation layering, and the non-DAG cycle detector. */
class ClosureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def closure(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    Closure.transitiveClosure(edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def scc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Closure.sccIds(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def bruteClosure(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    var r = edges.filter(e => e._1 != e._2).toSet
    var grown = true
    while (grown) {
      val nxt = r ++ (for ((a, b) <- r; (c, d) <- r if b == c) yield (a, d))
      grown = nxt.size != r.size
      r = nxt
    }
    r
  }

  test("closure matches brute force on a branchy digraph") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (5L, 3L), (4L, 4L))
    assert(closure(e) === bruteClosure(e))
  }

  test("deep chain closes in log rounds (doubling actually doubles)") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    // maxIter 8 < 40: single-edge extension could NOT close a 40-chain
    // in 8 rounds; doubling must (⌈log₂40⌉ + 1 = 7).
    val r = Closure.transitiveClosure(chain.toDF("src", "dst"), maxIter = 8)
    assert(r.count() === (41L * 40L) / 2)
  }

  test("scc ids: cycle members share the min id, the rest are singletons") {
    // cycle {1,2,3}, tail 3→4→5, upstream 0→1
    val ids = scc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (0L, 1L)))
    assert(ids === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 5L))
  }

  test("two disjoint cycles keep distinct component ids") {
    val ids = scc(Seq((1L, 2L), (2L, 1L), (7L, 8L), (8L, 9L), (9L, 7L),
      (2L, 7L)))
    assert(ids === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("dagLayers assigns longest-path depth; isolated nodes layer 0") {
    // diamond 0→{1,2}→3 plus long arm 0→4→5→3: 3 sits at depth 3
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (0L, 4L),
      (4L, 5L), (5L, 3L)).toDF("src", "dst")
    val nodes = (0L to 6L).toDF("id") // 6 is isolated
    val layers = Closure.dagLayers(e, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(layers === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 4L -> 1L,
      5L -> 2L, 3L -> 3L, 6L -> 0L))
  }

  test("dagLayers detects a cyclic input via maxIter") {
    val e = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    assertThrows[IllegalStateException] {
      Closure.dagLayers(e, Seq(0L, 1L).toDF("id"), maxIter = 8)
    }
  }
}
