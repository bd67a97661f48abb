package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A15 — DLQ replay as a batch two-way routed write (reference
  * replay-dlq-job.js:21-147): pull DLQ rows, strip transport attributes,
  * stamp replay metadata, then route park-vs-replay on the attempt count.
  *
  * The reference's per-message ack-after-publish loop collapses into the
  * atomicity of one batch write per route; pacing/caps (BATCH_SIZE,
  * REPLAY_DELAY_MS, MAX_PULLS) are transport backpressure knobs that
  * Spark replaces with partitioned execution.
  */
object DlqReplay {

  final case class Routed(replay: DataFrame, parked: DataFrame)

  /** Attribute hygiene (replay-dlq-job.js:31-34): drop googclient_* and
    * the replay counter itself from a map<string,string> attrs column. */
  def cleanAttributes(attrs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    map_filter(attrs, (k, _) =>
      !k.startsWith("googclient_") && k =!= "x-replay-attempts")

  /** Route a DLQ table: rows with attempts >= maxAttempts go to the
    * parking lot (with x-parked-reason / x-final-attempt-count); the rest
    * are stamped with an incremented counter for re-publication
    * (replay-dlq-job.js:36-46, 76-92). Both routes carry
    * x_original_message_id and x_replay_timestamp (reconstructMessage,
    * replay-dlq-job.js:36-38), and ordering_key — when the source has
    * one — survives untouched on every output row (js:49-51).
    *
    * @param replayTimestamp fixed stamp for deterministic tests; None =
    *   current_timestamp() (the reference's `new Date().toISOString()`).
    */
  def route(dlq: DataFrame, maxAttempts: Int = 3,
      attemptsCol: String = "replay_attempts",
      replayTimestamp: Option[java.sql.Timestamp] = None): Routed = {
    val attempts = col(attemptsCol)
    val stamp = replayTimestamp.map(ts => lit(ts).cast("timestamp"))
      .getOrElse(current_timestamp())
    val base =
      (if (dlq.columns.contains("message_id"))
        dlq.withColumn("x_original_message_id", col("message_id"))
      else dlq.withColumn("x_original_message_id", lit(null).cast("string")))
        .withColumn("x_replay_timestamp", stamp)
    // the reference counts the parking pass itself: x-final-attempt-count
    // = currentAttempts + 1 (reconstructMessage, replay-dlq-job.js:25,44)
    val parked = base.filter(attempts >= maxAttempts)
      .withColumn("x_parked_reason",
        lit(s"Exceeded max replay attempts ($maxAttempts)"))
      .withColumn("x_final_attempt_count", attempts + 1)
    val replay = base.filter(attempts < maxAttempts)
      .withColumn(attemptsCol, attempts + 1)
    Routed(replay, parked)
  }
}
