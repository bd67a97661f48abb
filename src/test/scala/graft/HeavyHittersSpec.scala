package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

/** Misra–Gries guarantee tests: every true heavy hitter survives any
  * partitioning/merge order, and estimates respect the n/(k+1) bound. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 500 a's, 300 b's, 120 c's, 200 distinct singletons: n = 1120
  private val items: Seq[String] =
    Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(120)("c") ++
      (0 until 200).map(i => s"rare$i")

  test("true heavy hitters survive with n/(k+1)-bounded estimates") {
    val k = 9
    val n = items.length
    val bound = n / (k + 1) // = 112
    val hits = items.toDS()
      .select(HeavyHitters.sketch(k).toColumn).head()
      .map(h => h.item -> h.min_count).toMap
    assert(hits.size <= k)
    // every item with true frequency > n/(k+1) MUST be present
    for ((item, true_c) <- Seq("a" -> 500L, "b" -> 300L, "c" -> 120L)) {
      assert(hits.contains(item), s"$item (freq $true_c > $bound) missing")
      val est = hits(item)
      assert(est <= true_c, s"$item estimate $est exceeds true $true_c")
      assert(est >= true_c - bound,
        s"$item estimate $est below lower bound ${true_c - bound}")
    }
  }

  test("the guarantee holds under adversarial partitioning (mergeable summaries)") {
    // shuffle + spread over many partitions: every partial sees a
    // different slice, merges happen in whatever order Spark picks —
    // the bound must hold regardless
    val shuffled = new scala.util.Random(7).shuffle(items)
    val k = 9
    val bound = items.length / (k + 1)
    val hits = shuffled.toDS().repartition(16)
      .select(HeavyHitters.sketch(k).toColumn).head()
      .map(h => h.item -> h.min_count).toMap
    for ((item, true_c) <- Seq("a" -> 500L, "b" -> 300L, "c" -> 120L)) {
      assert(hits.contains(item), s"$item missing after 16-way merge")
      assert(hits(item) <= true_c && hits(item) >= true_c - bound)
    }
    // output is descending with a deterministic tie-break
    val ordered = shuffled.toDS().repartition(16)
      .select(HeavyHitters.sketch(k).toColumn).head()
    assert(ordered.map(_.min_count).toSeq ===
      ordered.map(_.min_count).toSeq.sortBy(-_))
  }

  test("a single dominant item is exact; k=1 degrades gracefully") {
    val solo = Seq.fill(50)("x")
    val hits = solo.toDS()
      .select(HeavyHitters.sketch(1).toColumn).head()
    assert(hits === Seq(HeavyHitters.Hit("x", 50L)))
  }
}
