package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** TextDedup.prefixFilterCandidates: the prefix-filter theorem's
  * COMPLETENESS guarantee (every true τ-pair surfaces as a candidate)
  * against driver-side brute force on adversarial corpora, plus the
  * length-filter and prefix-size behaviors. */
class PrefixFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gramsOf(docs: Seq[(Long, Seq[String])]) =
    docs.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .toDF("doc_id", "gram")

  private def candidates(docs: Seq[(Long, Seq[String])],
      num: Long, den: Long): Set[(Long, Long)] =
    TextDedup.prefixFilterCandidates(gramsOf(docs), num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def truePairs(docs: Seq[(Long, Seq[String])],
      num: Long, den: Long): Set[(Long, Long)] = {
    val sets = docs.map { case (id, ts) => id -> ts.toSet }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).intersect(sets(b)).size.toLong
      union = sets(a).union(sets(b)).size.toLong
      if inter * den >= num * union
    } yield (a, b)).toSet
  }

  test("completeness: every τ-pair is a candidate (deterministic corpus)") {
    // overlapping word sets with shared rare and common tokens
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (0L until 24L).map { id =>
      // doc i holds tokens {i·7 + j (mod 30) : j < 8 + i mod 5}
      val n = 8 + (id % 5).toInt
      id -> (0 until n).map(j => vocab(((id * 7).toInt + j * 3) % 30))
        .distinct
    }
    for ((num, den) <- Seq((3L, 5L), (1L, 2L), (4L, 5L))) {
      val want = truePairs(docs, num, den)
      val cand = candidates(docs, num, den)
      assert(want.subsetOf(cand),
        s"missed ${want.diff(cand)} at tau=$num/$den")
    }
  }

  test("near-identical docs always pair; disjoint docs never do") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d", "e"),
      2L -> Seq("a", "b", "c", "d", "f"), // J = 4/6 = 2/3 ≥ 3/5
      3L -> Seq("x", "y", "z"))
    val cand = candidates(docs, 3L, 5L)
    assert(cand.contains((1L, 2L)))
    assert(!cand.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("length filter prunes hopeless pairs sharing a token") {
    // share token "a" but |1|=2, |2|=10: J ≤ 2/10 < 3/5, and the
    // integer length filter (la·3 ≤ lb·5 ∧ lb·3 ≤ la·5) must kill it
    val docs = Seq(
      1L -> Seq("a", "b"),
      2L -> ("a" +: (0 until 9).map(i => s"t$i")))
    assert(candidates(docs, 3L, 5L).isEmpty)
  }

  test("tau = 1 (exact set equality) still pairs duplicates") {
    val docs = Seq(
      1L -> Seq("p", "q", "r"),
      2L -> Seq("r", "q", "p"),
      3L -> Seq("p", "q"))
    val cand = candidates(docs, 1L, 1L)
    assert(cand.contains((1L, 2L)))
    assert(!cand.contains((1L, 3L)) && !cand.contains((2L, 3L)))
  }

  test("duplicate gram rows collapse to set semantics") {
    val docs = gramsOf(Seq(
      1L -> Seq("a", "a", "a", "b"),
      2L -> Seq("a", "b", "b")))
    val cand = TextDedup.prefixFilterCandidates(docs, 1L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand === Set((1L, 2L))) // both are {a, b} as sets
  }
}
