package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mmr

/** Mmr: the greedy λ=1/2 selection must skip near-copies a plain top-k
  * would take, exhaust small groups gracefully, brute-force-match the
  * reference recurrence, and break ties on vec_id. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference of the identical greedy recurrence. */
  private def brute(cands: Seq[(Long, Long, Long)],
      sims: Map[(Long, Long, Long), Long], k: Int): Seq[(Long, Long, Long)] = {
    cands.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      var sel = Vector.empty[(Long, Long, Long)] // (q, vec, step)
      var rem = cs.map(c => c._2 -> c._3).toMap
      for (step <- 1 to k if rem.nonEmpty) {
        val scored = rem.map { case (v, rel) =>
          // max over selected, NOT clamped at 0 — all-negative sims
          // must stay negative, exactly like the operator's max()
          val ms = if (sel.isEmpty) 0L
            else sel.map(s => sims.getOrElse((q, v, s._2), 0L)).max
          v -> (rel - ms)
        }
        val (pick, _) = scored.minBy { case (v, sc) => (-sc, v) }
        sel :+= ((q, pick, step.toLong))
        rem -= pick
      }
      sel
    }
  }

  test("near-copies of the best hit are deferred in favour of coverage") {
    // candidates: 10 (rel .99), 11 (rel .98, sim .97 to 10), 12 (rel .80,
    // dissimilar). Plain top-2 = {10, 11}; MMR must pick {10, 12}.
    val cand = Seq((1L, 10L, 990000L), (1L, 11L, 980000L), (1L, 12L, 800000L))
      .toDF("q_id", "vec_id", "rel_fp")
    val pairs = Seq(
      (1L, 10L, 11L, 970000L), (1L, 11L, 10L, 970000L),
      (1L, 10L, 12L, 100000L), (1L, 12L, 10L, 100000L),
      (1L, 11L, 12L, 120000L), (1L, 12L, 11L, 120000L))
      .toDF("q_id", "a", "b", "sim_fp")
    val got = Mmr.select(cand, pairs, k = 2)
      .orderBy("step").collect().map(r => (r.getLong(2), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 12L)))
  }

  test("groups with fewer candidates than k exhaust cleanly") {
    val cand = Seq((1L, 10L, 5L), (1L, 11L, 4L), (2L, 20L, 9L))
      .toDF("q_id", "vec_id", "rel_fp")
    val pairs = Seq((1L, 10L, 11L, 1L), (1L, 11L, 10L, 1L))
      .toDF("q_id", "a", "b", "sim_fp")
    val got = Mmr.select(cand, pairs, k = 4)
      .groupBy("q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("property: matches the brute-force greedy recurrence") {
    import org.scalacheck.Gen
    for (trial <- 1 to 5) {
      val nC = Gen.chooseNum(3, 12).sample.getOrElse(6)
      val cands = for {
        q <- 1L to 2L; v <- 0L until nC.toLong
      } yield (q, 100L + v,
        Gen.chooseNum(-500000L, 999999L).sample.getOrElse(0L))
      val sims = (for {
        q <- 1L to 2L
        a <- 0L until nC.toLong; b <- 0L until nC.toLong if a != b
      } yield {
        val s = Gen.chooseNum(-500000L, 999999L).sample.getOrElse(0L)
        (q, 100L + a, 100L + b) -> s
      }).toMap
      // symmetrize so (a,b) and (b,a) agree like real cosine sims
      val symSims = sims.map { case ((q, a, b), s) =>
        if (a < b) (q, a, b) -> s else (q, a, b) -> sims((q, b, a))
      }
      val cand = cands.toSeq.toDF("q_id", "vec_id", "rel_fp")
      val pairs = symSims.toSeq.map { case ((q, a, b), s) => (q, a, b, s) }
        .toDF("q_id", "a", "b", "sim_fp")
      val got = Mmr.select(cand, pairs, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val want = brute(cands.toSeq, symSims, 5)
        .map { case (q, v, st) => (q, v, st) }.sorted
      assert(got.toSeq == want, s"trial $trial")
    }
  }
}
