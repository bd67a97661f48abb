package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StableMatching

/** StableMatching: round-parallel deferred acceptance against a
  * driver-side SEQUENTIAL Gale–Shapley (one proposal at a time) —
  * exact pair-set equality, valid because the proposer-optimal stable
  * matching is unique and proposal-order-independent (McVitie–Wilson).
  * Plus the stability property itself (no blocking pair) on random
  * markets, and textbook shapes. */
class StableMatchingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** prefs: (proposer, acceptor, rank_p, rank_a). */
  private def run(prefs: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] =
    StableMatching.matching(prefs.toDF("p", "a", "rp", "ra"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Driver-side classical GS: free proposers propose one at a time
    * in id order, advancing a pointer down their list. */
  private def brute(prefs: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] = {
    val byP = prefs.groupBy(_._1).map { case (p, l) =>
      p -> l.sortBy(_._3).map(_._2) }
    val rankA = prefs.map(t => (t._2, t._1) -> t._4).toMap
    val ptr = scala.collection.mutable.Map.empty[Long, Int]
      .withDefaultValue(0)
    val hold = scala.collection.mutable.Map.empty[Long, Long] // a -> p
    var free = scala.collection.mutable.SortedSet.empty[Long] ++ byP.keys
    while (free.nonEmpty) {
      val p = free.head
      val list = byP(p)
      if (ptr(p) >= list.length) free -= p
      else {
        val a = list(ptr(p)); ptr(p) += 1
        hold.get(a) match {
          case None => hold(a) = p; free -= p
          case Some(q) =>
            if (rankA((a, p)) < rankA((a, q))) {
              hold(a) = p; free -= p; free += q
            }
        }
      }
    }
    hold.map { case (a, p) => (p, a) }.toSet
  }

  /** No blocking pair: a (p, a) pair both strictly prefer over their
    * assignment. */
  private def stable(prefs: Seq[(Long, Long, Long, Long)],
      m: Set[(Long, Long)]): Boolean = {
    val pOf = m.toMap
    val aOf = m.map(_.swap).toMap
    val rp = prefs.map(t => (t._1, t._2) -> t._3).toMap
    val ra = prefs.map(t => (t._1, t._2) -> t._4).toMap
    prefs.forall { case (p, a, _, _) =>
      val pHappier = pOf.get(p) match {
        case Some(cur) => rp((p, a)) < rp((p, cur))
        case None => true
      }
      val aHappier = aOf.get(a) match {
        case Some(cur) => ra((cur, a)) > ra((p, a))
        case None => true
      }
      !(pHappier && aHappier)
    }
  }

  /** Full bipartite market with ranks derived from a score table. */
  private def market(nP: Int, nA: Int, score: (Long, Long) => Long)
      : Seq[(Long, Long, Long, Long)] = {
    val ps = (0 until nP).map(_.toLong)
    val as = (100 until 100 + nA).map(_.toLong)
    val cells = for (p <- ps; a <- as) yield (p, a, score(p, a))
    def ranks[K](group: Seq[(Long, Long, Long)], key: ((Long, Long, Long)) => Long,
        other: ((Long, Long, Long)) => Long): Map[(Long, Long), Long] =
      group.groupBy(key).flatMap { case (_, l) =>
        l.sortBy(t => (-t._3, other(t))).zipWithIndex
          .map { case (t, i) => (t._1, t._2) -> (i + 1L) }
      }
    val rp = ranks(cells, _._1, _._2)
    val ra = ranks(cells, _._2, _._1)
    cells.map { case (p, a, _) => (p, a, rp((p, a)), ra((p, a))) }
  }

  test("textbook 3x3 instance matches the classical result") {
    // Wikipedia-style: everyone ranks; proposer-optimal outcome.
    val prefs = market(3, 3, (p, a) => ((p * 7 + a * 13) % 11))
    val got = run(prefs)
    assert(got == brute(prefs))
    assert(stable(prefs, got))
    assert(got.size == 3)
  }

  test("identical preferences: acceptors go to proposers in rank order") {
    // every proposer ranks acceptors identically; every acceptor
    // prefers lower proposer ids → proposer i gets acceptor i.
    val prefs = market(4, 4, (p, a) => -(a - 100) * 10 - p)
    val got = run(prefs)
    assert(got == brute(prefs))
    assert(got == Set((0L, 100L), (1L, 101L), (2L, 102L), (3L, 103L)))
  }

  test("unbalanced market leaves the worst-ranked proposers unmatched") {
    val prefs = market(5, 3, (p, a) => ((p * 3 + a) % 7))
    val got = run(prefs)
    assert(got == brute(prefs))
    assert(got.size == 3)
    assert(stable(prefs, got))
  }

  test("random markets match sequential GS exactly and are stable") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 6 + trial * 4
      val prefs = market(n, n, (p, a) => rnd.nextInt(1000).toLong)
      val got = run(prefs)
      assert(got == brute(prefs), s"trial $trial")
      assert(stable(prefs, got), s"trial $trial instability")
    }
  }

  test("maxRounds exhausted with free proposers holding untried acceptors throws") {
    // Both proposers want acceptor 100 first; the round-1 loser still
    // holds an untried acceptor (101), so a 1-round cap must refuse.
    val prefs = Seq(
      (0L, 100L, 1L, 1L), (0L, 101L, 2L, 1L),
      (1L, 100L, 1L, 2L), (1L, 101L, 2L, 2L))
    val ex = intercept[IllegalStateException] {
      StableMatching.matching(prefs.toDF("p", "a", "rp", "ra"),
        maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("maxRounds=1 exhausted"))
    assert(run(prefs) == Set((0L, 100L), (1L, 101L)))
  }

  test("live-prefs compaction path matches sequential GS (every round, threshold 0)") {
    // force the compaction branch on unit-sized markets: cadence 1,
    // threshold 0 — every round rewrites the live frame minus the
    // derived rejections. Rejections are monotone, so the fixpoint
    // (and the exhaustion check) must be untouched; displacement-heavy
    // random markets exercise mid-run compactions specifically.
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 5 + trial * 3
      val prefs = market(n, n, (_, _) => rnd.nextInt(50).toLong)
      val got = StableMatching.matching(prefs.toDF("p", "a", "rp", "ra"),
          compactEvery = 1, compactMinRows = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(prefs), s"trial $trial")
      assert(stable(prefs, got), s"trial $trial instability")
    }
    // unbalanced + compacted: unmatched tail proposers still exhaust
    // their lists without tripping the exhaustion throw
    val prefs = market(6, 3, (p, a) => ((p * 5 + a * 3) % 13))
    val got = StableMatching.matching(prefs.toDF("p", "a", "rp", "ra"),
        compactEvery = 2, compactMinRows = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(prefs))
  }

  test("a cap met exactly at the empty-proposal fixpoint does not throw") {
    // Balanced 3x3 with identical lists resolves all proposals in 3
    // rounds; with maxRounds=3 the loop exits before OBSERVING the
    // empty round, but no free proposer holds an untried acceptor.
    val prefs = market(3, 3, (p, a) => (a - 100) * 10 + p)
    val got = StableMatching.matching(
        prefs.toDF("p", "a", "rp", "ra"), maxRounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(prefs))
  }
}
