package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingTransitions
import graft.streaming.StreamingTransitions.{TransEvent, Transition}

class StreamingTransitionsSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("transitions emit across micro-batches with last-type state (q151 streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val events = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[TransEvent]
    val out = StreamingTransitions.transitions(events, idleMinutes = 30)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("trans_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-trans").toString)
      .start()
    // batch 1: user 1 view → click (one transition inside the batch)
    input.addData(
      TransEvent(1L, 1L, ts("10:00"), "view"),
      TransEvent(1L, 2L, ts("10:05"), "click"))
    q.processAllAvailable()
    // batch 2: user 1 purchase — transition must bridge the batch gap
    // via the persisted last-type state
    input.addData(TransEvent(1L, 3L, ts("10:10"), "purchase"))
    q.processAllAvailable()
    // batch 3: a second user; no prior state → no transition emitted
    input.addData(TransEvent(2L, 4L, ts("10:15"), "signup"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_out").as[Transition].collect()
      .sortBy(t => (t.user_id, t.ts.getTime))
    assert(got.toSeq.map(t => (t.user_id, t.from_type, t.to_type)) ===
      Seq((1L, "view", "click"), (1L, "click", "purchase")))
  }

  test("single-batch replay reproduces the batch q151 counts exactly") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
      .as[TransEvent]
    val streamed = StreamingTransitions
      .transitionCounts(StreamingTransitions.transitions(ev))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = SparkEntry.queries("q151_event_transitions")(spark, dir)
      .select(col("from_type"), col("to_type"), col("n_trans"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
  }
}
