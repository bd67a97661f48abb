package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
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
  */
object StreamingDecayedRate {

  final case class RateEvent(id: Long, tsMs: Long, key: String)

  final case class DecayState(lastMs: Long, count: Double, n: Long)

  final case class RateReading(key: String, n_so_far: Long,
      decayed_count: Double, rate_per_sec: Double, quiet: Boolean)

  private def stateFn(halfLifeMs: Double, minRatePerSec: Double,
      minEvents: Long)(key: String, events: Iterator[RateEvent],
      state: GroupState[DecayState]): Iterator[RateReading] = {
    val sorted = events.toSeq.sortBy(e => (e.tsMs, e.id))
    if (sorted.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(DecayState(Long.MinValue, 0.0, 0L))
    sorted.foreach { e =>
      val decayed =
        if (st.lastMs == Long.MinValue) 0.0
        else st.count * math.pow(0.5,
          math.max(0L, e.tsMs - st.lastMs).toDouble / halfLifeMs)
      st = DecayState(math.max(st.lastMs, e.tsMs), decayed + 1.0,
        st.n + 1)
    }
    state.update(st)
    val rate = st.count * math.log(2.0) / (halfLifeMs / 1000.0)
    Iterator.single(RateReading(key, st.n, st.count, rate,
      st.n >= minEvents && rate < minRatePerSec))
  }

  /** One rate reading per (key, micro-batch that touched it). */
  def monitor(events: Dataset[RateEvent], halfLifeMs: Double = 60000.0,
      minRatePerSec: Double = 0.1, minEvents: Long = 10L)(
      implicit spark: SparkSession): Dataset[RateReading] = {
    import spark.implicits._
    require(halfLifeMs > 0.0, "halfLife must be positive")
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, RateReading](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        stateFn(halfLifeMs, minRatePerSec, minEvents))
  }
}
