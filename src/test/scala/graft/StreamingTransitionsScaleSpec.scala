package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingTransitions
import graft.streaming.StreamingTransitions.{TransEvent, Transition}

/** Bench-scale streaming transitions (the round-12 Markov leg of the
  * scale-evidence tier): the FULL sf0.1 events table streamed in
  * event-time order through [[StreamingTransitions.transitions]] as
  * micro-batches must emit EXACTLY the transition counts of q151's
  * batch lead-window formulation — every (from_type, to_type, n_trans)
  * triple equal, no tolerance. The per-user last-type state bridges
  * every micro-batch boundary, so count equality at corpus scale
  * proves the stateful recurrence IS the batch window: a user's
  * timeline split across any number of batches folds to the same
  * chain.
  *
  * The idle timeout is set beyond the table's time span so state GC
  * never fires — q151 has no gap cutoff, and the GC path (state
  * expiry after watermark passage) is pinned separately at unit scale
  * in StreamingTransitionsSpec.
  */
class StreamingTransitionsScaleSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  test("sf0.1 events streamed in event-time order reproduce q151's counts exactly") {
    val dir = "/root/testdata/sf0.1"
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"))
      .as[TransEvent]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val events = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[TransEvent]
    // idleMinutes beyond the table's span: q151 counts every
    // consecutive pair regardless of gap, so no state may expire
    val out = StreamingTransitions.transitions(events,
      idleMinutes = 400 * 24 * 60)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("trans_scale")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-trans-scale").toString)
      .start()
    val batchSize = 5000
    val t0 = System.nanoTime()
    ev.grouped(batchSize).foreach { chunk =>
      input.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val streamed = StreamingTransitions.transitionCounts(
      spark.table("trans_scale").as[Transition])
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = SparkEntry.queries("q151_event_transitions")(spark, dir)
      .select(col("from_type"), col("to_type"), col("n_trans"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch,
      "streamed transition counts diverge from q151's batch window")
    val nTrans = streamed.toSeq.map(_._3).sum
    val nUsers = ev.map(_.user_id).distinct.length
    assert(nTrans === ev.length - nUsers,
      "every user chain must contribute length-1 transitions")

    val rate = ev.length / secs
    println(f"[stream-trans] ${ev.length}%d events / " +
      f"${ev.grouped(batchSize).size}%d micro-batches in $secs%.1f s " +
      f"= $rate%.0f events/s; transitions=$nTrans%d pairs=${streamed.size}%d")
    PerfGate.check(rate, 100.0, "streaming transitions")
  }
}
