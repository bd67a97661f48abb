package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LabelPropagation

/** Label propagation: every round must match an independent
  * driver-side reference of the same deterministic synchronous
  * algorithm (most-frequent neighbour label, ties to smallest,
  * 2-cycle oscillation broken by the smaller alternating label), and
  * the headline semantic — sparsely-bridged dense regions stay
  * separate communities where ConnectedComponents merges them — must
  * hold. */
class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference LPA with identical semantics. */
  private def referenceLpa(edges: Seq[(Long, Long)], nodes: Seq[Long],
      maxIter: Int = 20): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nodes.map(n => n -> n).toMap
    var prev: Map[Long, Long] = null
    var round = 0
    var settled = false
    while (!settled && round < maxIter) {
      round += 1
      val next = labels.map { case (n, l) =>
        adj.get(n) match {
          case None | Some(Seq()) => n -> l
          case Some(nbrs) =>
            val counts = nbrs.groupBy(labels).view.mapValues(_.size).toSeq
            n -> counts.minBy { case (lbl, c) => (-c, lbl) }._1
        }
      }
      if (next == labels) settled = true
      else if (prev != null && next == prev) {
        labels = next.map { case (n, l) => n -> math.min(l, labels(n)) }
        settled = true
      } else if (round == maxIter) {
        // horizon exhausted: same least-damping as the 2-cycle break
        labels = next.map { case (n, l) => n -> math.min(l, labels(n)) }
      } else { prev = labels; labels = next }
    }
    labels
  }

  private def check(edges: Seq[(Long, Long)], nodes: Seq[Long],
      maxIter: Int = 20): Map[Long, Long] = {
    val got = LabelPropagation.communities(
        edges.toDF("src", "dst"), nodes.toDF("id"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = referenceLpa(edges, nodes, maxIter)
    assert(got == want, s"\n got $got\nwant $want")
    got
  }

  test("two cliques over one bridge stay separate communities (CC merges them)") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 5L to 8L; j <- (i + 1) to 8L) yield (i, j)
    val edges = cliqueA ++ cliqueB :+ (4L, 5L)
    val nodes = (1L to 8L).toSeq
    val got = check(edges, nodes)
    assert(got.values.toSet.size == 2, s"expected 2 communities: $got")
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((5L to 8L).map(got).toSet.size == 1)
    val cc = graft.operators.ConnectedComponents.labels(
        edges.toDF("src", "dst"), nodes.toDF("id"))
      .collect().map(_.getLong(1)).toSet
    assert(cc.size == 1, "CC merges the bridged cliques by design")
  }

  test("bipartite oscillation settles deterministically") {
    // a single edge 2-cycles under synchronous updates; the break rule
    // must land both nodes on the smaller label
    val got = check(Seq((1L, 2L)), Seq(1L, 2L))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("isolated nodes keep their own label; rerun is identical") {
    val edges = Seq((10L, 11L), (11L, 12L))
    val nodes = Seq(10L, 11L, 12L, 99L)
    val first = check(edges, nodes)
    assert(first(99L) == 99L)
    assert(check(edges, nodes) == first)
  }

  test("path graph matches the reference round for round") {
    check((1L until 7L).map(i => (i, i + 1)), (1L to 7L).toSeq)
  }

  test("horizon exhaustion damps with least(label_H, label_H-1)") {
    // a long path is still churning after 1 and 2 rounds — the
    // operator must apply the same least-damping the fixed-horizon
    // oracle uses, not return the raw last round
    val edges = (1L until 10L).map(i => (i, i + 1))
    val nodes = (1L to 10L).toSeq
    for (h <- Seq(1, 2, 3)) check(edges, nodes, maxIter = h)
  }
}
