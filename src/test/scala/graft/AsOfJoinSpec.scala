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
}
