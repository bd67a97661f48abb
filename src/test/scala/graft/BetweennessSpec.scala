package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Betweenness

/** Betweenness: the fixed-point Brandes accumulation against a
  * driver-side reference implementing the identical integer algebra,
  * plus known-shape sanity (path centers, star hubs, horizon
  * truncation). */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map { case (a, b) => (b, a) }).toDF("src", "dst")

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      hops: Int): Map[Long, Long] =
    Betweenness.dependencies(sym(edges), seeds.toDF("id"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference k-source Brandes with the same ×1e6 per-term floor
    * division, on the driver. */
  private def brute(edges: Seq[(Long, Long)], seeds: Seq[Long],
      hops: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (v, l) => v -> l.map(_._2) }
    val acc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for (s <- seeds) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Set(s)
      var d = 0
      while (frontier.nonEmpty && d < hops) {
        d += 1
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- frontier; w <- adj.getOrElse(v, Nil)
             if !dist.contains(w) || dist(w) == d)
          { dist(w) = d; nxt(w) = nxt.getOrElse(w, 0L) + sigma(v) }
        frontier = nxt.keySet.toSet
        nxt.foreach { case (w, sg) => sigma(w) = sg }
      }
      val delta = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      val maxd = if (dist.isEmpty) 0 else dist.values.max
      for (l <- (maxd - 1) to 0 by -1; v <- dist.keys
           if dist(v) == l) {
        var t = 0L
        for (w <- adj.getOrElse(v, Nil)
             if dist.get(w).contains(l + 1))
          t += (sigma(v) * (1000000L + delta(w))) / sigma(w)
        if (t != 0L) delta(v) = t
        if (v != s && t != 0L) acc(v) += t
      }
    }
    acc.toMap
  }

  test("path P5 center carries the most flow (all-node seeds)") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val seeds = Seq(0L, 1L, 2L, 3L, 4L)
    val got = run(e, seeds, hops = 4)
    assert(got === brute(e, seeds, hops = 4))
    assert(got(2L) > got(1L) && got(1L) > 0L)
    assert(!got.contains(0L) && !got.contains(4L)) // ends broker nothing
  }

  test("star hub takes all dependency, leaves none") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val seeds = Seq(1L, 2L, 3L, 4L)
    val got = run(e, seeds, hops = 3)
    assert(got === brute(e, seeds, hops = 3))
    assert(got.keySet === Set(0L))
  }

  test("diamond splits σ and halves the per-branch dependency") {
    // 0→{1,2}→3: two shortest paths; each mid node gets δ = 1e6/2
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val got = run(e, Seq(0L), hops = 2)
    assert(got === Map(1L -> 500000L, 2L -> 500000L))
  }

  test("horizon truncation drops long-path dependencies only") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val full = run(e, Seq(0L), hops = 4)
    val cut2 = run(e, Seq(0L), hops = 2)
    assert(cut2 === brute(e, Seq(0L), hops = 2))
    assert(cut2(1L) < full(1L)) // beyond-horizon flow missing
    assert(!cut2.contains(3L))
  }

  test("parity with the reference on a branchy mesh, multi-seed") {
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L), (4L, 5L), (5L, 6L), (2L, 6L), (6L, 7L))
    val seeds = Seq(0L, 3L, 7L)
    assert(run(e, seeds, hops = 4) === brute(e, seeds, hops = 4))
  }
}
