package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponentially-decayed arrival-rate monitor: per key an
  * O(1) decayed event counter with a configurable half-life — the
  * "current traffic level" number behind rate alarms and adaptive
  * sampling, robust where a fixed-window count whipsaws. Each event
  * first decays the counter by 2^(−Δt/halfLife) (event-time Δt, so
  * replays are exact), then adds 1; the reading converts the counter
  * to an events-per-second rate via the closed form
  * rate = count·ln2/halfLife.
  *
  * Complements [[StreamingEwma]] (level of a VALUE) with the intensity
  * of ARRIVALS, and [[StreamingFreshness]] (is data current) with how
  * much of it is flowing. Alarm fires when the decayed rate falls
  * below `minRatePerSec` after the key has warmed up — a dead-feed
  * detector that a raw count-per-batch cannot express when batches are
  * irregular.
  *
  * Dead feeds: a key that stops sending entirely would never re-invoke
  * the state function under NoTimeout, so the alarm could never fire
  * for exactly the feeds it exists for. The monitor therefore arms an
  * EVENT-TIME timeout at lastEventTs + silenceMs: once the stream's
  * watermark (advanced by the still-alive keys) passes that point, the
  * state function fires with hasTimedOut and emits a reading whose
  * counter is decayed to the watermark — same event-time clock as the
  * arrival decay, so the whole monitor (timeout readings included) is
  * replay-deterministic with no wall-clock dependence. The stored
  * counter is NOT mutated on timeout, so a late event that still beats
  * the watermark decays by its exact event-time Δt (no double decay).
  * ProcessingTimeTimeout is deliberately avoided: it forces a batch
  * per trigger forever (`shouldRunAnotherBatch` is unconditionally
  * true), which busy-loops the query and breaks processAllAvailable.
  */
object StreamingDecayedRate {

  final case class RateEvent(id: Long, tsMs: Long, key: String)

  final case class DecayState(lastMs: Long, count: Double, n: Long)

  final case class RateReading(key: String, n_so_far: Long,
      decayed_count: Double, rate_per_sec: Double, quiet: Boolean,
      timed_out: Boolean)

  private def stateFn(halfLifeMs: Double, minRatePerSec: Double,
      minEvents: Long, silenceMs: Long)(key: String,
      events: Iterator[RateEvent],
      state: GroupState[DecayState]): Iterator[RateReading] = {
    def reading(count: Double, n: Long, timedOut: Boolean) = {
      val rate = count * math.log(2.0) / (halfLifeMs / 1000.0)
      RateReading(key, n, count, rate,
        n >= minEvents && rate < minRatePerSec, timedOut)
    }
    val sorted = events.toSeq.sortBy(e => (e.tsMs, e.id))
    if (state.hasTimedOut || sorted.isEmpty) {
      // Watermark passed lastMs + silenceMs with no events: emit a
      // reading decayed to the watermark (virtually — the stored
      // event-time state stays intact for exact late-event decay) and
      // re-arm one silence window past the watermark.
      state.getOption match {
        case Some(st) =>
          val wm = state.getCurrentWatermarkMs()
          val virt = st.count * math.pow(0.5,
            math.max(0L, wm - st.lastMs).toDouble / halfLifeMs)
          state.setTimeoutTimestamp(wm + silenceMs)
          Iterator.single(reading(virt, st.n, timedOut = true))
        case None => Iterator.empty
      }
    } else {
      var st = state.getOption.getOrElse(
        DecayState(Long.MinValue, 0.0, 0L))
      sorted.foreach { e =>
        val decayed =
          if (st.lastMs == Long.MinValue) 0.0
          else st.count * math.pow(0.5,
            math.max(0L, e.tsMs - st.lastMs).toDouble / halfLifeMs)
        st = DecayState(math.max(st.lastMs, e.tsMs), decayed + 1.0,
          st.n + 1)
      }
      state.update(st)
      // event-time timeouts must be strictly later than the watermark;
      // a straggler batch entirely behind it arms from the watermark
      state.setTimeoutTimestamp(
        math.max(st.lastMs, state.getCurrentWatermarkMs() + 1L) + silenceMs)
      Iterator.single(reading(st.count, st.n, timedOut = false))
    }
  }

  /** One rate reading per (key, micro-batch that touched it), plus a
    * timeout reading each time the watermark crosses `silenceMs` of
    * event-time silence for a warmed key. `watermarkDelay` is the
    * out-of-orderness allowance on the event-time column. */
  def monitor(events: Dataset[RateEvent], halfLifeMs: Double = 60000.0,
      minRatePerSec: Double = 0.1, minEvents: Long = 10L,
      silenceMs: Long = 30000L, watermarkDelay: String = "10 seconds")(
      implicit spark: SparkSession): Dataset[RateReading] = {
    import spark.implicits._
    require(halfLifeMs > 0.0, "halfLife must be positive")
    require(silenceMs > 0L, "silence window must be positive")
    events
      .withColumn("event_time", timestamp_millis(col("tsMs")))
      .withWatermark("event_time", watermarkDelay)
      .as[RateEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, RateReading](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(halfLifeMs, minRatePerSec, minEvents, silenceMs))
  }
}
