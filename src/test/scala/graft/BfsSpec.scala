package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bfs

/** Bfs: min-hop semantics against a driver-side reference BFS,
  * directedness, the maxHops bound, and early exhaustion. */
class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refBfs(edges: Seq[(Long, Long)], seed: Long,
      maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("hop distances are minimal and respect edge direction") {
    // 1→2→3→4 chain plus shortcut 1→3; 4→1 back-edge makes it cyclic
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val got = Bfs.distances(edges, Seq(Tuple1(1L)).toDF("id"), maxHops = 5)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("maxHops truncates; unreachable nodes are absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val got = Bfs.distances(edges, Seq(Tuple1(1L)).toDF("id"), maxHops = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4 beyond, 10/11 disconnected
  }

  test("multi-seed: distances are per seed and early exit works") {
    val edges = Seq((1L, 2L), (5L, 6L)).toDF("src", "dst")
    val got = Bfs.distances(edges, Seq(Tuple1(1L), Tuple1(5L)).toDF("id"),
        maxHops = 10) // frontier exhausts at hop 2 — must not loop to 10
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 0L, (1L, 2L) -> 1L,
      (5L, 5L) -> 0L, (5L, 6L) -> 1L))
  }

  test("property: random digraphs match the reference BFS") {
    import org.scalacheck.Gen
    for (trial <- 1 to 6) {
      val n = Gen.chooseNum(2, 50).sample.getOrElse(20)
      val es = (0 until n).flatMap { _ =>
        for {
          a <- Gen.chooseNum(0L, 14L).sample
          b <- Gen.chooseNum(0L, 14L).sample if a != b
        } yield (a, b)
      }.distinct
      if (es.nonEmpty) {
        val seeds = Seq(0L, 7L)
        val got = Bfs.distances(es.toDF("src", "dst"),
            seeds.map(Tuple1(_)).toDF("id"), maxHops = 4)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        val want = seeds.flatMap(s =>
          refBfs(es, s, 4).map { case (node, d) => (s, node) -> d }).toMap
        assert(got == want, s"trial $trial edges=$es")
      }
    }
  }
}
