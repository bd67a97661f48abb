package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Hits

/** Hits.scoresFp: fixed-point parity with a driver-side reference
  * iteration, mass conservation, and degenerate-node handling. */
class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side twin of the exact integer algebra. */
  private def refHits(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val n = nodes.size
    var h = nodes.map(_ -> Hits.Scale / n).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val aRaw = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h(e._1)).sum }
      val aTot = aRaw.values.sum
      a = nodes.map(v =>
        v -> aRaw.getOrElse(v, 0L) * Hits.Scale / aTot).toMap
      val hRaw = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a(e._2)).sum }
      val hTot = hRaw.values.sum
      h = nodes.map(v =>
        v -> hRaw.getOrElse(v, 0L) * Hits.Scale / hTot).toMap
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] =
    Hits.scoresFp(edges.toDF("src", "dst"),
        nodes.map(Tuple1(_)).toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("hand graph matches the reference integer iteration") {
    // star: 1,2,3 all point at 4; 4 points at 5
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = run(nodes, edges, 3)
    assert(got == refHits(nodes, edges, 3))
    // 4 is the authority of the star; 5 has no out-edges → hub 0
    assert(got(4L)._2 > got(5L)._2 && got(5L)._1 == 0L)
    // 1..3 are symmetric hubs with identical scores
    assert(got(1L) == got(2L) && got(2L) == got(3L))
  }

  test("isolated node survives with both scores zero") {
    val got = run(Seq(1L, 2L, 9L), Seq((1L, 2L)), 2)
    assert(got(9L) == (0L, 0L))
    assert(got(1L)._1 > 0L && got(2L)._2 > 0L)
  }

  test("L1 mass stays ≈ Scale after every normalization (floor loss only)") {
    val rnd = new scala.util.Random(7)
    val nodes = (1L to 40L).toSeq
    val edges = (1 to 160).map(_ =>
      (rnd.between(1L, 41L), rnd.between(1L, 41L))).filter(e => e._1 != e._2)
      .distinct
    val got = run(nodes, edges, 4)
    val hubSum = got.values.map(_._1).sum
    val authSum = got.values.map(_._2).sum
    assert(hubSum <= Hits.Scale && hubSum > Hits.Scale - nodes.size)
    assert(authSum <= Hits.Scale && authSum > Hits.Scale - nodes.size)
    assert(got == refHits(nodes, edges, 4))
  }

  test("edge-free graph: every node survives with hub=auth=0, never NULL") {
    val rows = Hits.scoresFp(
        Seq.empty[(Long, Long)].toDF("src", "dst"),
        Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id"), 2)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"NULL score in $r")
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    }
  }
}
