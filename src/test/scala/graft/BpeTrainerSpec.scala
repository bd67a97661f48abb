package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

/** BPE trainer: every distributed merge must match an independent
  * driver-side reference implementation of the textbook algorithm
  * (same greedy left-to-right application, same (count desc, pair asc)
  * tiebreak), on both the classic Sennrich-style corpus and an
  * overlap-heavy adversarial one. */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference BPE on a driver-side vocabulary map. */
  private def referenceBpe(vocab: Map[String, Long], k: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var segs = vocab.map { case (t, f) => t -> t.map(_.toString).toVector }
    val merges = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var done = 0
    while (done < k && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((t, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + vocab(t)
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        merges += ((l, r, n))
        segs = segs.map { case (t, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          t -> out.result()
        }
        done += 1
      }
    }
    (merges.result(), segs)
  }

  private def check(vocab: Map[String, Long], k: Int): Unit = {
    val df = vocab.toSeq.toDF("token", "freq")
    val trained = BpeTrainer.train(df, k)
    val (wantMerges, wantSegs) = referenceBpe(vocab, k)
    val gotMerges = trained.merges.map(m => (m.left, m.right, m.pairCount))
    assert(gotMerges == wantMerges,
      s"merges diverge:\n got $gotMerges\nwant $wantMerges")
    val gotSegs = trained.vocab.select("token", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(gotSegs == wantSegs)
  }

  test("matches the reference algorithm on the classic subword corpus") {
    // Sennrich-style: 'es'/'est' emerge from newest/widest before
    // anything in low/lower
    check(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L), 8)
  }

  test("greedy overlap semantics: runs of one symbol merge non-overlapping") {
    // 'aaaa' under merge (a,a): [aa, aa]; 'aaa': [aa, a] — and the
    // follow-up merges compound on the merged symbols
    check(Map("aaaa" -> 3L, "aaa" -> 2L, "ab" -> 7L, "abab" -> 1L), 5)
  }

  test("stops early when no pairs remain and handles 1-char tokens") {
    val df = Seq(("a", 5L), ("b", 3L)).toDF("token", "freq")
    val trained = BpeTrainer.train(df, 4)
    assert(trained.merges.isEmpty)
    assert(trained.vocab.select("syms").collect()
      .forall(_.getSeq[String](0).length == 1))
  }

  test("merge application column works standalone") {
    val got = Seq(Seq("x", "a", "b", "a", "b"), Seq("a"), Seq[String]())
      .toDF("syms")
      .select(BpeTrainer.applyMerge(col("syms"), "a", "b").as("m"))
      .collect().map(_.getSeq[String](0).toVector)
    assert(got(0) == Vector("x", "ab", "ab"))
    assert(got(1) == Vector("a"))
    assert(got(2) == Vector())
  }
}
