package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")

  test("as-of join attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("10:00"), 100L), (1L, ts("10:30"), 101L),
      (1L, ts("09:00"), 102L), // before any quote
      (2L, ts("10:15"), 200L))
      .toDF("user_id", "ts", "event_id")
    val quotes = Seq(
      (1L, ts("09:30"), 900L, 5.0), (1L, ts("10:15"), 901L, 7.0),
      (1L, ts("10:30"), 902L, 9.0), // same instant as trade 101 → visible
      (2L, ts("10:00"), 903L, 3.0))
      .toDF("user_id", "ts", "event_id", "px")
    val got = AsOfJoin.asOf(trades, quotes, "user_id", "ts",
        valueCols = Seq("px"), tieBreak = Seq("event_id"))
      .select("event_id", "asof_px")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(100L) === Some(5.0)) // 10:00 → quote at 09:30
    assert(got(101L) === Some(9.0)) // 10:30 → same-instant quote wins
    assert(got(102L) === None)      // 09:00 → no preceding quote
    assert(got(200L) === Some(3.0)) // other key isolated
  }

  test("property: random series match the brute-force as-of (incl. ts collisions)") {
    import org.scalacheck.Gen
    val base = ts("00:00").getTime
    for (trial <- 1 to 8) {
      val nL = Gen.chooseNum(1, 30).sample.getOrElse(10)
      val nR = Gen.chooseNum(0, 30).sample.getOrElse(10)
      // coarse minute grid FORCES timestamp collisions, both across
      // sides (same-instant visibility) and within the right side
      def t() = new Timestamp(
        base + Gen.chooseNum(0, 20).sample.getOrElse(0) * 60000L)
      def key() = Gen.chooseNum(1L, 3L).sample.getOrElse(1L)
      val lefts = (0 until nL).map(i => (key(), t(), 100L + i))
      // right rows unique per (key, ts): multiple right rows at one
      // instant have no defined winner without a tieBreak column
      val rights = (0 until nR).map(i => (key(), t(), 900L + i, i * 1.5))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val got = AsOfJoin.asOf(
          lefts.toDF("k", "ts", "event_id"),
          rights.toDF("k", "ts", "rid", "px"),
          "k", "ts", valueCols = Seq("px"), tieBreak = Seq("event_id"))
        .select("event_id", "asof_px")
        .as[(Long, Option[Double])].collect().toMap
      val want = lefts.map { case (k, lts, id) =>
        val preceding = rights.filter(r => r._1 == k && !r._2.after(lts))
        id -> (if (preceding.isEmpty) None
               else Some(preceding.maxBy(_._2.getTime)._4))
      }.toMap
      assert(got == want, s"trial $trial lefts=$lefts rights=$rights")
    }
  }
}
