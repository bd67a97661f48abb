package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sssp

/** Sssp: Bellman–Ford semantics on hand-built weighted graphs — the
  * cheaper-but-longer path must win once rounds allow it, the round
  * bound must truncate exactly at "≤ R edges", multi-seed independence,
  * unreachable nodes stay absent, and frontier early-exit equals the
  * full-round answer. */
class SsspSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[(Long, Long), Long] =
    Sssp.distances(edges.toDF("src", "dst", "w"),
        seeds.toDF("id"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("longer-hop cheaper path beats the direct edge") {
    // 0→3 direct costs 10; 0→1→2→3 costs 3.
    val e = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    val d = run(e, Seq(0L), rounds = 4)
    assert(d((0L, 3L)) === 3L)
    assert(d((0L, 0L)) === 0L)
    assert(d((0L, 2L)) === 2L)
  }

  test("round bound truncates at ≤ R edges exactly") {
    val e = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    // With only 2 rounds the 3-edge path is not explorable: direct wins.
    val d2 = run(e, Seq(0L), rounds = 2)
    assert(d2((0L, 3L)) === 10L)
    // One round: frontier reaches 1 and the direct edge only.
    val d1 = run(e, Seq(0L), rounds = 1)
    assert(d1((0L, 3L)) === 10L && d1((0L, 1L)) === 1L)
    assert(!d1.contains((0L, 2L)))
  }

  test("seeds are independent and unreachable nodes are absent") {
    val e = Seq((0L, 1L, 5L), (2L, 3L, 7L))
    val d = run(e, Seq(0L, 2L), rounds = 3)
    assert(d === Map((0L, 0L) -> 0L, (0L, 1L) -> 5L,
      (2L, 2L) -> 0L, (2L, 3L) -> 7L))
  }

  test("early exit matches generous round budget (convergence)") {
    val e = Seq((0L, 1L, 2L), (1L, 2L, 2L), (2L, 0L, 2L), (1L, 3L, 9L),
      (0L, 3L, 14L))
    assert(run(e, Seq(0L), rounds = 3) === run(e, Seq(0L), rounds = 50))
  }

  test("cycle does not trap the walk and min stays exact") {
    // 0→1→2→1 cycle with decreasing-cost revisits impossible (positive
    // weights); 2 reached through the cycle entry once.
    val e = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 1L, 1L))
    val d = run(e, Seq(0L), rounds = 10)
    assert(d === Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (0L, 2L) -> 2L))
  }
}
