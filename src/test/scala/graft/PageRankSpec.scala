package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** Semantic tests of the fixed-point PageRank — the q104 oracle gate
  * proves cross-engine equality on the KNN graph; these prove the
  * integer algebra on planted graphs, by hand. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one iteration matches the hand-computed integer algebra exactly") {
    // 1→2, 2→1, 3→2 — all out-degrees 1
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val got = PageRank.ranksFp(edges, nodes, iterations = 1)
      .as[(Long, Long)].collect().toMap
    // r1(1) = 0.15e9 + (85 · 1e9) div 100          = 1_000_000_000
    // r1(2) = 0.15e9 + (85 · 2e9) div 100          = 1_850_000_000
    // r1(3) = 0.15e9 + 0 (no in-edges)             =   150_000_000
    assert(got === Map(1L -> 1000000000L, 2L -> 1850000000L,
      3L -> 150000000L))
  }

  test("floor division is exact: contribution of a split rank truncates") {
    // one node with out-degree 3 and rank 1e9: each contribution is
    // 1e9 div 3 = 333_333_333 (truncated, NOT rounded)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val got = PageRank.ranksFp(edges, nodes, iterations = 1)
      .as[(Long, Long)].collect().toMap
    // 0.15e9 + (85 · 333_333_333) div 100 = 150e6 + 283_333_333 (floor)
    assert(got(2L) === 150000000L + (85L * 333333333L) / 100L)
    assert(got(2L) === got(3L) && got(3L) === got(4L))
    assert(got(1L) === 150000000L) // dangling in-rank: teleport only
  }

  test("3 iterations rank a hub above spokes, deterministically across runs") {
    // star: 4 spokes all point at the hub; hub points at one spoke
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val nodes = (0L to 4L).toDF("id")
    val a = PageRank.ranksFp(edges, nodes, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.ranksFp(edges, nodes, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b, "integer ranks must be bit-identical across runs")
    assert(a(0L) > a(1L), "hub outranks the reciprocated spoke")
    assert(a(1L) > a(2L), "reciprocated spoke outranks pure sources")
    assert(a(2L) === a(3L) && a(3L) === a(4L))
  }
  test("personalized: teleport and start mass land only on seeds, hand-exact") {
    // seeds {1}: N=3, S=1 → seed teleport (0.15e9·3)//1 = 450e6,
    // start fp(1) = (1e9·3)//1 = 3e9, others 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val got = PageRank.personalizedRanksFp(edges, nodes,
        Seq(1L).toDF("id"), iterations = 1)
      .as[(Long, Long)].collect().toMap
    // r1(1) = 450e6 + (85 · fp0(3)=0) div 100       = 450_000_000
    // r1(2) = 0     + (85 · fp0(1)=3e9) div 100     = 2_550_000_000
    // r1(3) = 0     + (85 · fp0(2)=0) div 100       = 0
    assert(got === Map(1L -> 450000000L, 2L -> 2550000000L, 3L -> 0L))
  }

  test("personalized: nodes unreachable from the seeds stay at exactly 0") {
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst") // two islands
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val got = PageRank.personalizedRanksFp(edges, nodes,
        Seq(1L).toDF("id"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(3L) === 0L && got(4L) === 0L)
    assert(got(1L) > 0L && got(2L) > 0L)
  }

}
