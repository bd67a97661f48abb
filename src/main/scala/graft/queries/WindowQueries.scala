package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CoreFunctions._

/** Window analytics and the batch-equivalent forms of the streaming
  * queries (SURVEY §2C Q16–Q17, Q22–Q24). The genuinely-streaming
  * formulations (readStream + watermark) live in graft.streaming; these
  * batch twins are what the DuckDB oracle checks.
  */
object WindowQueries {

  val all: Seq[EngineQuery] = Seq(

    // Q16 — per-user ordered analytics: lag/lead, running sum, moving avg.
    EngineQuery("q16_window_analytics",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val frame5 = w.rowsBetween(-4, 0)
        val running = w.rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_value", lead(col("value"), 1).over(w))
          .withColumn("running_sum",
            sum(money(col("value"))).over(running).cast("double"))
          .withColumn("moving_avg",
            (sum(money(col("value"))).over(frame5).cast("double") /
              count(lit(1)).over(frame5).cast("double")))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, ts, value,
             |  lag(value, 1) OVER w AS prev_value,
             |  lead(value, 1) OVER w AS next_value,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
             |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
             |    OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             |  / CAST(COUNT(*) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Q17 — exact distinct counts (the approx_count_distinct variant is
    // q17b below, self-checked without an oracle).
    EngineQuery("q17_distinct_users",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             |  COUNT(*) AS n_events
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q17b — approx_count_distinct (HLL++): no cross-engine oracle (sketch
    // implementations differ); driver records a rows-only check, and the
    // scalatest suite asserts ±5% of exact.
    EngineQuery("q17b_approx_distinct",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type"),
      None),

    // Q16b — ranking/distribution window battery: ntile, percent_rank,
    // cume_dist, first/last value over deterministic frames.
    EngineQuery("q46_window_battery",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val frame = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"), col("ts"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .withColumn("first_val", first(col("value")).over(frame))
          .withColumn("last_val", last(col("value")).over(frame))
          .drop("ts")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
             |  row_number() OVER w AS rn,
             |  ntile(4) OVER w AS quartile,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume,
             |  first_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val,
             |  last_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Q22 — tumbling 1-hour window aggregation (streaming twin uses the
    // same window() operator behind a watermark).
    EngineQuery("q22_tumbling_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q23 — sliding 30-minute window, 15-minute slide: each event lands in
    // two windows. Batch oracle: union of the two aligned truncations.
    EngineQuery("q23_sliding_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "30 minutes", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - off) AS window_start,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events, (SELECT unnest([0, 900000000]) AS off) offsets
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q24 — sessionization, 30-minute gap. Spark side uses the native
    // session_window operator; oracle reproduces it with a lag/cumsum
    // session id (new session when gap >= 30 min).
    EngineQuery("q24_sessionization",
      (s, dir) => Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(money(col("value"))).cast("double").as("session_value"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("session_start"),
          col("session_window.end").cast("timestamp_ntz").as("session_end"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start"),
      Some("""SELECT user_id,
             |  MIN(ts) AS session_start,
             |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
             |FROM (
             |  SELECT user_id, ts, value,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM (
             |    SELECT user_id, ts, value, event_id,
             |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |        OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800000000
             |        THEN 1 ELSE 0 END AS new_session
             |    FROM events) flags) sessions
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_start""".stripMargin)),

    // Q65 — stream-stream interval join (click→purchase attribution).
    // The SAME StreamingAnalytics.clickAttribution dataflow runs here on
    // the batch frame (withWatermark is a no-op in batch); in streaming
    // the watermarks + the bounded event-time gap give Spark a state
    // eviction horizon on both sides.
    EngineQuery("q65_stream_join",
      (s, dir) => graft.streaming.StreamingAnalytics
        .clickAttribution(Tables.events(s, dir))
        .orderBy("purchase_id", "click_id"),
      Some(s"""SELECT p.event_id AS purchase_id, c.event_id AS click_id,
              |  c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
              |  p.value AS purchase_value
              |FROM events c JOIN events p
              |  ON p.user_id = c.user_id
              |  AND c.event_type = 'click' AND p.event_type = 'purchase'
              |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL ${graft.streaming.StreamingAnalytics.DefaultJoinWindowMinutes} MINUTE
              |ORDER BY purchase_id, click_id""".stripMargin))
  )
}
