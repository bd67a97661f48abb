package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (the streaming-native twin
  * of the batch session_window query q24): per-user sessions close after
  * `gapMinutes` of event-time silence, driven by
  * flatMapGroupsWithState + event-time timeout.
  *
  * State per user is O(1) (open-session accumulator only) — safe at any
  * cardinality; timeouts garbage-collect idle users as the watermark
  * passes their gap horizon.
  */
object StatefulSessionizer {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)

  final case class OpenSession(start: Long, lastTs: Long, n: Long,
      sum: Double)

  final case class SessionOut(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, session_value: Double)

  private def out(userId: Long, s: OpenSession, gapMs: Long): SessionOut =
    SessionOut(userId, new java.sql.Timestamp(s.start),
      new java.sql.Timestamp(s.lastTs + gapMs), s.n, s.sum)

  private def stateFn(gapMs: Long)(userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(s => out(userId, s, gapMs))
      state.remove()
      closed.iterator
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var open = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.lastTs < gapMs =>
            open = Some(s.copy(lastTs = math.max(s.lastTs, t), n = s.n + 1,
              sum = s.sum + e.value))
          case Some(s) =>
            closed += out(userId, s, gapMs)
            open = Some(OpenSession(t, t, 1L, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapMs)
      }
      closed.iterator
    }
  }

  /** Sessionize a (possibly streaming) event dataset. The input must
    * carry a watermark on `ts` for event-time timeouts to fire. */
  def sessions(events: Dataset[SessionEvent], gapMinutes: Int)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(stateFn(gapMs))
  }
}
