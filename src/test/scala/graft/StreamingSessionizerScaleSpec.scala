package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.{SessionEvent, SessionOut}

/** Bench-scale streaming sessionization (r11 VERDICT ask #4): the FULL
  * sf0.1 events table (100k events, 1.5k users) streamed through
  * [[StatefulSessionizer]] as event-time-ordered micro-batches must
  * close EXACTLY the sessions q24's batch `session_window` formulation
  * produces — same (user, start, end, n_events, value) tuples, exact
  * equality, no tolerance.
  *
  * Validity of the comparison:
  *   - events feed in ascending (ts, event_id) order, so with a
  *     0-second watermark nothing is ever late AND a session that
  *     times out mid-stream can never see a pre-gap event afterwards
  *     — the stateful split points coincide with the batch gap rule
  *     (merge iff gap < 30 min, boundary splits in both).
  *   - session_value uses CENT-integer doubles (round(value*100)):
  *     integer-valued doubles below 2⁵³ add exactly in any order, so
  *     the stateful arrival-order sum and the batch aggregate sum are
  *     bit-equal — the q123/q202 float-parity discipline.
  *   - a single far-future dummy event (user −1) pushes the watermark
  *     past every real session's gap horizon so ALL real sessions
  *     close via event-time timeout; the dummy's own (still-open)
  *     session is excluded from both sides.
  *
  * The measured events/s prints as the PLANS.md evidence line — this
  * is Q24's continuous form, the most production-critical of the
  * streaming monitors, so its scale story needs a corpus-sized number
  * (the StreamingDedupScaleSpec pattern, round-11).
  */
class StreamingSessionizerScaleSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sf0.1 events streamed in micro-batches close exactly q24's batch sessions") {
    val gapMin = 30
    val raw = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .filter(col("ts").isNotNull)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        round(coalesce(col("value"), lit(0.0)) * 100.0).as("value"),
        col("event_id").cast("long").as("event_id"))

    // batch twin: q24's session_window formulation over the SAME input
    val batch = raw
      .groupBy(session_window(col("ts"), s"$gapMin minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect()
      .map(t => (t._1, t._2.getTime, t._3.getTime, t._4, t._5)).toSet

    val events = raw.as[SessionEvent].collect()
      .sortBy(e => (e.ts.getTime, e.user_id))
    val maxTs = events.map(_.ts.getTime).max

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StatefulSessionizer.sessions(
      input.toDS().withWatermark("ts", "0 seconds").as[SessionEvent], gapMin)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_scale")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess-scale").toString)
      .start()
    val batchSize = 5000
    val t0 = System.nanoTime()
    events.grouped(batchSize).foreach { chunk =>
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // watermark pusher: closes every real open session via timeout
    input.addData(SessionEvent(-1L,
      new java.sql.Timestamp(maxTs + 4L * 3600 * 1000), 0.0))
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val streamed = spark.table("sess_scale").as[SessionOut].collect()
      .filter(_.user_id >= 0L)
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events, s.session_value)).toSet
    assert(streamed.size === batch.size,
      s"session count diverges: streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed === batch)

    val rate = events.length / secs
    println(f"[stream-sessionize] ${events.length}%d events / " +
      f"${events.grouped(batchSize).size}%d micro-batches in $secs%.1f s " +
      f"= $rate%.0f events/s; sessions=${streamed.size}%d")
    PerfGate.check(rate, 100.0, "streaming sessionization")
  }
}
