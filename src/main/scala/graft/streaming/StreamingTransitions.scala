package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transition tracker: the streaming-native twin of
  * the batch Markov-matrix query q151. Per-user state is the LAST seen
  * event type only — O(1) per active user — and each arriving event
  * emits one (from_type → to_type) transition record; the micro-batch
  * counts aggregate downstream (`transitionCounts`).
  *
  * Scale contract:
  *   - state per user = one (ts, type) pair; idle users are garbage-
  *     collected by event-time timeout once the watermark passes
  *     `idleMinutes` of silence (the sessionizer's GC discipline), so
  *     state size tracks ACTIVE users, not lifetime users.
  *   - events within a micro-batch are ordered by (ts, event_id) before
  *     folding — the same total order as the batch twin's window, so a
  *     single-batch replay reproduces q151's counts exactly
  *     (StreamingTransitionsSpec pins this equivalence).
  *   - cross-batch order relies on the watermark: a transition is
  *     attributed to whatever state survived the previous batch, which
  *     is the streaming approximation every last-state tracker makes.
  */
object StreamingTransitions {

  final case class TransEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, event_type: String)

  final case class LastType(lastTs: Long, lastType: String)

  final case class Transition(user_id: Long, from_type: String,
      to_type: String, ts: java.sql.Timestamp)

  private def stateFn(idleMs: Long)(userId: Long,
      events: Iterator[TransEvent],
      state: GroupState[LastType]): Iterator[Transition] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
      var last = state.getOption
      sorted.foreach { e =>
        last.foreach(l =>
          out += Transition(userId, l.lastType, e.event_type, e.ts))
        last = Some(LastType(e.ts.getTime, e.event_type))
      }
      last.foreach { l =>
        state.update(l)
        state.setTimeoutTimestamp(l.lastTs + idleMs)
      }
      out.iterator
    }
  }

  /** Emit per-event transitions from a (possibly streaming) dataset.
    * The input must carry a watermark on `ts` for idle-state GC. */
  def transitions(events: Dataset[TransEvent], idleMinutes: Int = 60)(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastType, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(idleMinutes * 60L * 1000L))
  }

  /** Transition-count aggregation over the emitted stream — one keyed
    * aggregation, the same shape the batch twin groups by. */
  def transitionCounts(t: Dataset[Transition]): DataFrame =
    t.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
}
