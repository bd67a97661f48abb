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

    // Q17b — approx_count_distinct (HLL++) as a HASH-GATED error
    // report: DuckDB cannot replicate Spark's internal sketch, but it
    // can replicate the CLAIM about it. Spark emits the 5%-accuracy
    // check as data (integer arithmetic: 20·|approx−exact| ≤ exact, at
    // rsd=0.01 so the bound is ~5σ) and the oracle asserts TRUE — any
    // sketch drift past the bound flips the boolean and fails the hash
    // gate. The q260/q261 approx-vs-exact reporting pattern; the raw
    // estimate stays pinned ±5% in the scalatest suite.
    EngineQuery("q17b_approx_distinct",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("exact_users"), col("n_events"),
          (abs(col("approx_users") - col("exact_users")) * lit(20L) <=
            col("exact_users")).as("within_5pct"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  COUNT(DISTINCT user_id) AS exact_users,
             |  COUNT(*) AS n_events,
             |  TRUE AS within_5pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

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
              |ORDER BY purchase_id, click_id""".stripMargin)),

    // EXT — time-spine gap fill with forward fill: resample each user's
    // event stream onto a complete hourly spine (missing hours appear
    // with n_events = 0) and carry the last observed hourly value
    // forward — the dense-time-series build every monitoring/feature
    // pipeline runs before a model sees the data. The spine bounds come
    // from a per-user aggregate (one keyed pass), the hourly rollup is
    // one keyed aggregation, and the fill is one ordered window per
    // user — no self-joins, no per-hour scans. Report subset
    // (user_id < 50) keeps the entry bench-cheap; the shape is
    // entity-partitioned and scales with |users| · |hours|.
    EngineQuery("q105_gap_fill",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir).filter(col("user_id") < 50)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n_events"),
            moneySum(col("value")).as("sum_value"))
        val spine = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
          .select(col("user_id"),
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
        val w = Window.partitionBy("user_id").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(hourly, Seq("user_id", "hour"), "left")
          .select(col("user_id"),
            col("hour").cast("timestamp_ntz").as("hour"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            col("sum_value"),
            last(col("sum_value"), ignoreNulls = true).over(w)
              .as("filled_value"))
          .orderBy("user_id", "hour")
      },
      Some("""WITH ev AS (SELECT * FROM events WHERE user_id < 50),
             |hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS hour,
             |    COUNT(*) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |  FROM ev GROUP BY 1, 2),
             |spine AS (
             |  SELECT user_id,
             |    unnest(generate_series(date_trunc('hour', mn),
             |      date_trunc('hour', mx), INTERVAL 1 HOUR)) AS hour
             |  FROM (SELECT user_id, MIN(ts) AS mn, MAX(ts) AS mx
             |        FROM ev GROUP BY 1) r)
             |SELECT s.user_id, s.hour,
             |  COALESCE(h.n_events, 0) AS n_events, h.sum_value,
             |  last_value(h.sum_value IGNORE NULLS) OVER (
             |    PARTITION BY s.user_id ORDER BY s.hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
             |FROM spine s LEFT JOIN hourly h USING (user_id, hour)
             |ORDER BY user_id, hour""".stripMargin)),

    // EXT — OHLC downsampling (candlestick resample): per (event_type,
    // hour) the opening/closing value by event time plus high/low and
    // volume — the standard numeric-stream compaction. Open/close are
    // SELECTIONS (min_by/max_by on the (ts, event_id) order key), not
    // arithmetic, so doubles pass through exactly; volume uses the
    // exact decimal sum. One keyed aggregation, map-side partials.
    EngineQuery("q106_ohlc_resample",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          count(lit(1)).as("n_events"),
          moneySum(col("value")).as("volume"))
        .select(col("event_type"),
          col("hour").cast("timestamp_ntz").as("hour"),
          col("open"), col("high"), col("low"), col("close"),
          col("n_events"), col("volume"))
        .orderBy("event_type", "hour"),
      Some("""SELECT event_type, date_trunc('hour', ts) AS hour,
             |  first(value ORDER BY ts, event_id) AS open,
             |  MAX(value) AS high, MIN(value) AS low,
             |  last(value ORDER BY ts, event_id) AS close,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
             |FROM events GROUP BY 1, 2
             |ORDER BY event_type, hour""".stripMargin)),

    // EXT — key-skew audit: the top-20 heaviest keys with their share
    // and cumulative share of all rows — the report that decides
    // whether a key needs salting (q62) before it becomes the straggler
    // partition at 100 TB. Scale shape: per-key counts partial-aggregate
    // map-side; the top-20 is TakeOrdered (no global sort, no
    // single-partition window over |keys|) and the rank/cumulative
    // window runs over 20 rows.
    EngineQuery("q122_key_skew_audit",
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val tot = counts.agg(sum("n_events").as("total"),
          count(lit(1)).as("n_keys"))
        val top = counts
          .orderBy(col("n_events").desc, col("user_id")).limit(20)
        val w = Window.orderBy(col("n_events").desc, col("user_id"))
        top.crossJoin(broadcast(tot))
          .withColumn("rnk", row_number().over(w))
          .withColumn("cum",
            sum("n_events").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("rnk").cast("long").as("rnk"), col("user_id"),
            col("n_events"), col("n_keys"), col("total"),
            round(col("n_events").cast("double") / col("total"), 6)
              .as("share"),
            round(col("cum").cast("double") / col("total"), 6)
              .as("cum_share"))
          .orderBy("rnk")
      },
      Some("""WITH c AS (
             |  SELECT user_id, COUNT(*) AS n_events
             |  FROM events GROUP BY 1),
             |t AS (
             |  SELECT CAST(SUM(n_events) AS BIGINT) AS total,
             |    COUNT(*) AS n_keys FROM c),
             |r AS (
             |  SELECT user_id, n_events,
             |    row_number() OVER (ORDER BY n_events DESC, user_id)
             |      AS rnk,
             |    CAST(SUM(n_events) OVER (ORDER BY n_events DESC, user_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM c)
             |SELECT rnk, user_id, n_events, t.n_keys, t.total,
             |  round(CAST(n_events AS DOUBLE) / t.total, 6) AS share,
             |  round(CAST(cum AS DOUBLE) / t.total, 6) AS cum_share
             |FROM r CROSS JOIN t
             |WHERE rnk <= 20 ORDER BY rnk""".stripMargin)),

    // EXT — event inter-arrival profile: per-user gaps between
    // consecutive events (the ingest-freshness / session-cadence
    // diagnostic). The lag window partitions on user_id — the same key
    // the sessionizer (q24) shuffles on — and the gap stats are exact
    // integer microsecond sums with one final rounded division.
    EngineQuery("q123_interarrival_profile",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("user_id"),
            (unix_micros(col("ts").cast("timestamp"))
              - unix_micros(col("prev").cast("timestamp"))).as("gap_us"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
            min("gap_us").as("min_gap_us"),
            max("gap_us").as("max_gap_us"),
            sum("gap_us").as("sum_us"))
          .select(col("user_id"), col("n_gaps"), col("min_gap_us"),
            col("max_gap_us"),
            // NO rounding: the operands are exact integers and the two
            // divisions run in the same order in both engines, so the
            // doubles are bit-identical — round(x, 6) is what BROKE
            // parity here (a half-ulp tie at the 6th decimal rounded
            // differently in Spark vs DuckDB at sf0.1)
            (col("sum_us").cast("double") / col("n_gaps") / 1e6)
              .as("mean_gap_s"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
             |  FROM events)
             |SELECT user_id, COUNT(*) AS n_gaps,
             |  MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
             |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0
             |    AS mean_gap_s
             |FROM g WHERE gap_us IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — exact Gini coefficient of the per-user event distribution
    // (the single-number skew summary behind the q122 top-key report).
    // Exact and DISTRIBUTED: the classic rank formulation
    // G = Σ (2·rank − n − 1)·c / (n·Σc) needs a global rank over |keys|,
    // but grouping equal counts first collapses the frame to |distinct
    // count values| rows — each group of k keys with count c contributes
    // c·(2k·(kb+1) + k(k−1) − k(n+1)) given kb keys below it — so the
    // one ordered window runs over the tiny value-histogram frame, never
    // |keys|. All terms are exact integers (DECIMAL(38) / HUGEINT
    // accumulation); the only float op is the final rounded division.
    EngineQuery("q129_user_gini",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val counts = Tables.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).as("c"))
        val byC = counts.groupBy("c").agg(count(lit(1)).as("k"))
        val w = Window.orderBy("c")
          .rowsBetween(Window.unboundedPreceding, -1)
        val tot = byC.agg(sum("k").as("n"),
          sum(col("c") * col("k")).as("tot"))
        val num = byC
          .withColumn("kb", coalesce(sum("k").over(w), lit(0L)))
          .crossJoin(broadcast(tot))
          .agg(sum(dec(col("c")) *
            (dec(lit(2)) * dec(col("k")) * dec(col("kb") + 1)
              + dec(col("k")) * dec(col("k") - 1)
              - dec(col("k")) * dec(col("n") + 1))).as("num"))
        num.crossJoin(broadcast(tot))
          .select(col("n").as("n_keys"), col("tot").as("total_events"),
            round(col("num").cast("double") /
              (col("n").cast("double") * col("tot").cast("double")), 6)
              .as("gini"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
             |g AS (SELECT c, COUNT(*) AS k FROM c GROUP BY 1),
             |t AS (
             |  SELECT CAST(SUM(k) AS BIGINT) AS n,
             |    CAST(SUM(c * k) AS BIGINT) AS tot FROM g),
             |w AS (
             |  SELECT c, k, COALESCE(SUM(k) OVER (ORDER BY c
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    AS kb
             |  FROM g),
             |s AS (
             |  SELECT SUM(CAST(c AS HUGEINT) *
             |    (2 * CAST(k AS HUGEINT) * (kb + 1) + CAST(k AS HUGEINT)
             |      * (k - 1) - CAST(k AS HUGEINT) * (n + 1))) AS num
             |  FROM w CROSS JOIN t)
             |SELECT t.n AS n_keys, t.tot AS total_events,
             |  round(CAST(s.num AS DOUBLE) /
             |    (CAST(t.n AS DOUBLE) * CAST(t.tot AS DOUBLE)), 6) AS gini
             |FROM t CROSS JOIN s""".stripMargin)),

    // EXT — RANGE-frame window battery: per-user trailing-1-hour
    // running sum and event count ordered by EVENT TIME (a true range
    // frame over a time axis, not a row frame — peers at the same
    // timestamp aggregate identically by definition). Spark's
    // rangeBetween needs a numeric order key, so the frame rides epoch
    // microseconds; the sum runs in exact DECIMAL (the money
    // discipline). One shuffle on user_id — the q16/q24 key.
    EngineQuery("q134_range_frame_window",
      (s, dir) => {
        val hourUs = 3600L * 1000000L
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"))
          .rangeBetween(-hourUs, 0)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
          .withColumn("trailing_1h_sum",
            sum(money(col("value"))).over(w).cast("double"))
          .withColumn("n_in_window", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"), col("trailing_1h_sum"),
            col("n_in_window"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             |    PARTITION BY user_id ORDER BY ts
             |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) AS trailing_1h_sum,
             |  COUNT(*) OVER (
             |    PARTITION BY user_id ORDER BY ts
             |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |    AS n_in_window
             |FROM events ORDER BY event_id""".stripMargin)),

    // EXT — hour-of-day seasonality profile: per (event_type, hour)
    // counts and each hour's share of its type — the traffic-shape
    // report behind capacity planning and anomaly baselines. One keyed
    // aggregation; the per-type totals join back as a broadcast.
    EngineQuery("q146_hourly_seasonality",
      (s, dir) => {
        val byHour = Tables.events(s, dir)
          .groupBy(col("event_type"),
            hour(col("ts")).cast("long").as("hour_of_day"))
          .agg(count(lit(1)).as("n_events"))
        val totals = byHour.groupBy("event_type")
          .agg(sum("n_events").as("type_total"))
        byHour.join(broadcast(totals), "event_type")
          .select(col("event_type"), col("hour_of_day"), col("n_events"),
            (col("n_events").cast("double") / col("type_total"))
              .as("hour_share"))
          .orderBy("event_type", "hour_of_day")
      },
      Some("""WITH h AS (
             |  SELECT event_type,
             |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
             |    COUNT(*) AS n_events
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, CAST(SUM(n_events) AS BIGINT)
             |    AS type_total
             |  FROM h GROUP BY 1)
             |SELECT h.event_type, h.hour_of_day, h.n_events,
             |  CAST(h.n_events AS DOUBLE) / t.type_total AS hour_share
             |FROM h JOIN t ON t.event_type = h.event_type
             |ORDER BY h.event_type, h.hour_of_day""".stripMargin)),

    // EXT — view→purchase conversion lag: per user, the time from the
    // FIRST view to the first purchase at-or-after it (the funnel
    // latency metric behind q73's step counts). The lag is an exact
    // microsecond BIGINT — no float anywhere. Two keyed aggregations
    // plus one join on the user key.
    EngineQuery("q150_conversion_lag",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_us").as("first_view_us"))
        val fp = ev.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("ts_us") >= col("first_view_us"))
          .groupBy("user_id").agg(min("ts_us").as("first_purchase_us"))
        fv.join(fp, "user_id")
          .select(col("user_id"),
            (col("first_purchase_us") - col("first_view_us"))
              .as("lag_us"))
          .orderBy("user_id")
      },
      Some("""WITH fv AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS first_view_us
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |fp AS (
             |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
             |  FROM events e JOIN fv ON fv.user_id = e.user_id
             |  WHERE e.event_type = 'purchase'
             |    AND epoch_us(e.ts) >= fv.first_view_us
             |  GROUP BY 1)
             |SELECT fv.user_id,
             |  fp.first_purchase_us - fv.first_view_us AS lag_us
             |FROM fv JOIN fp ON fp.user_id = fv.user_id
             |ORDER BY fv.user_id""".stripMargin)),

    // EXT — event-type Markov transition matrix: per user, adjacent
    // (from → to) event-type pairs in time order, with row-normalized
    // transition probabilities — the session-flow model behind funnel
    // design and next-event prediction baselines. One per-user window
    // (parallel across users), one keyed aggregation; the per-from-type
    // totals join back as a broadcast (|event types| rows at any SF).
    // p_trans is one exact-BIGINT division — identical in both engines.
    EngineQuery("q151_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n_trans"))
        val totals = pairs.groupBy("from_type")
          .agg(sum(col("n_trans")).as("from_total"))
        pairs.join(broadcast(totals), "from_type")
          .select(col("from_type"), col("to_type"), col("n_trans"),
            (col("n_trans").cast("double") /
              col("from_total").cast("double")).as("p_trans"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lead(event_type, 1) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |m AS (
             |  SELECT event_type AS from_type, to_type, COUNT(*) AS n_trans
             |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |t AS (
             |  SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS from_total
             |  FROM m GROUP BY 1)
             |SELECT m.from_type, m.to_type, m.n_trans,
             |  CAST(m.n_trans AS DOUBLE) / CAST(t.from_total AS DOUBLE)
             |    AS p_trans
             |FROM m JOIN t ON t.from_type = m.from_type
             |ORDER BY m.from_type, m.to_type""".stripMargin)),

    // EXT — A/B two-proportion z-test: cohort = user_id parity (the
    // deterministic assignment), conversion = "user emitted ≥14 events
    // of the target type" (an engagement threshold that genuinely splits
    // the population — "≥1" saturates at 100% on this corpus and the z
    // statistic degenerates), one row per target type with counts, rates
    // and the pooled z. All rates derive from exact BIGINT counts
    // through a FIXED-shape double formula (same operation order in both
    // engines; sqrt is correctly-rounded IEEE), so the gate hashes
    // bit-identical doubles; the degenerate all/none case guards z to
    // NULL via an exact integer predicate, not a float compare. Two
    // keyed aggregations (|users × types| then |types| rows) plus a
    // broadcast of the 1-row cohort sizes — nothing driver-side.
    EngineQuery("q153_ab_conversion",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            pmod(col("user_id"), lit(2)).as("cohort"))
        val sizes = ev.select(col("user_id"), col("cohort")).distinct()
          .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n1"))
        val perUser = ev.groupBy("user_id", "cohort", "event_type")
          .agg(count(lit(1)).as("n_ev"))
        val conv = perUser
          .groupBy(col("event_type").as("target_type"))
          .agg(sum(when(col("cohort") === 0 && col("n_ev") >= 14, 1L)
            .otherwise(0L)).as("c0"),
            sum(when(col("cohort") === 1 && col("n_ev") >= 14, 1L)
              .otherwise(0L)).as("c1"))
        val j = conv.crossJoin(broadcast(sizes))
        val (n0d, n1d) = (col("n0").cast("double"), col("n1").cast("double"))
        val p0 = col("c0").cast("double") / n0d
        val p1 = col("c1").cast("double") / n1d
        val pp = (col("c0") + col("c1")).cast("double") /
          (col("n0") + col("n1")).cast("double")
        val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / n0d + lit(1.0) / n1d))
        val z = when(col("c0") + col("c1") === 0 ||
            col("c0") + col("c1") === col("n0") + col("n1"),
            lit(null).cast("double"))
          .otherwise((p1 - p0) / se)
        j.select(col("target_type"), col("n0"), col("n1"), col("c0"),
            col("c1"), p0.as("p0"), p1.as("p1"), z.as("z"))
          .orderBy("target_type")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, user_id % 2 AS cohort
             |  FROM events),
             |sizes AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n0,
             |    CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1
             |  FROM (SELECT DISTINCT user_id, cohort FROM ev)),
             |pu AS (
             |  SELECT user_id, cohort, event_type, COUNT(*) AS n_ev
             |  FROM ev GROUP BY 1, 2, 3),
             |conv AS (
             |  SELECT event_type AS target_type,
             |    CAST(SUM(CASE WHEN cohort = 0 AND n_ev >= 14
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             |    CAST(SUM(CASE WHEN cohort = 1 AND n_ev >= 14
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
             |  FROM pu GROUP BY 1)
             |SELECT target_type, n0, n1, c0, c1,
             |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
             |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
             |  CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
             |  ELSE
             |    (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |    / sqrt(
             |        (CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
             |        * (1.0 - CAST(c0 + c1 AS DOUBLE)
             |            / CAST(n0 + n1 AS DOUBLE))
             |        * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
             |  END AS z
             |FROM conv CROSS JOIN sizes
             |ORDER BY target_type""".stripMargin)),

    // EXT — volume-anomaly days: days whose event count sits more than
    // 2 sample standard deviations from their type's daily mean — the
    // ops alarm built on q165's exact daily-count statistics (mean/std
    // from exact BIGINT sums, the |type|-row stats frame broadcasts
    // back onto the bounded |type × day| frame). The 2σ predicate
    // compares identical doubles, so the flagged set is deterministic.
    EngineQuery("q196_volume_anomaly_days",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"),
            datediff(col("ts").cast("date"),
              lit("1990-01-01").cast("date")).cast("long").as("x"))
          .groupBy("event_type", "x")
          .agg(count(lit(1)).as("c"))
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sx"),
            sum(col("c") * col("c")).as("sxx"))
        val nd = col("n_days").cast("double")
        val mean = col("sx").cast("double") / nd
        val sd = sqrt((nd * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (nd * (nd - lit(1.0))))
        daily.join(broadcast(stats), "event_type")
          .withColumn("z", (col("c").cast("double") - mean) / sd)
          .filter(abs(col("z")) > 2.0)
          .select(col("event_type"), col("x").as("day_idx"), col("c"),
            col("z"))
          .orderBy("event_type", "day_idx")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', DATE '1990-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) AS x,
             |    COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, COUNT(*) AS n_days,
             |    CAST(SUM(c) AS BIGINT) AS sx,
             |    CAST(SUM(c * c) AS BIGINT) AS sxx
             |  FROM daily GROUP BY 1),
             |z AS (
             |  SELECT d.event_type, d.x, d.c,
             |    (CAST(d.c AS DOUBLE)
             |      - CAST(s.sx AS DOUBLE) / CAST(s.n_days AS DOUBLE))
             |    / sqrt((CAST(s.n_days AS DOUBLE) * CAST(s.sxx AS DOUBLE)
             |        - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE))
             |      / (CAST(s.n_days AS DOUBLE)
             |        * (CAST(s.n_days AS DOUBLE) - 1.0))) AS z
             |  FROM daily d JOIN stats s ON s.event_type = d.event_type)
             |SELECT event_type, x AS day_idx, c, z
             |FROM z WHERE abs(z) > 2.0
             |ORDER BY event_type, day_idx""".stripMargin)),

    // EXT — Neyman-optimal stratified sample allocation: per stratum
    // (event_type), allocate a 10k-row sample budget ∝ N_h·s_h — the
    // survey-sampling complement to q68's proportional stratification.
    // Stratum std-devs come from exact DECIMAL sufficient statistics;
    // the cross-stratum total accumulates over an ORDERED |strata|-row
    // running window (the only double summation — sequential adds in a
    // defined order in both engines), and the grand total is the MAX of
    // the monotone running sum (weights are ≥0), an order-independent
    // reduction. One keyed aggregation over the scan; windows only ever
    // see |strata| rows.
    EngineQuery("q157_neyman_allocation",
      (s, dir) => {
        val stats = Tables.events(s, dir)
          .select(col("event_type"), money(col("value")).as("v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_h"),
            sum(col("v")).cast("double").as("sx"),
            sum(col("v") * col("v")).cast("double").as("sxx"))
        val nh = col("n_h").cast("double")
        val sH = sqrt((nh * col("sxx") - col("sx") * col("sx")) /
          (nh * (nh - lit(1.0))))
        val wRun = Window.orderBy("event_type")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.partitionBy()
        stats
          .withColumn("s_h", sH)
          .withColumn("weight", nh * col("s_h"))
          .withColumn("running", sum(col("weight")).over(wRun))
          .withColumn("total", max(col("running")).over(wAll))
          .select(col("event_type"), col("n_h"), col("s_h"),
            (col("weight") / col("total")).as("alloc_share"),
            floor(lit(10000.0) * (col("weight") / col("total")))
              .cast("long").as("alloc_n"))
          .orderBy("event_type")
      },
      Some("""WITH stats AS (
             |  SELECT event_type, COUNT(*) AS n_h,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))
             |      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
             |  FROM events GROUP BY 1),
             |w AS (
             |  SELECT event_type, n_h,
             |    sqrt((CAST(n_h AS DOUBLE) * sxx - sx * sx)
             |      / (CAST(n_h AS DOUBLE) * (CAST(n_h AS DOUBLE) - 1.0)))
             |      AS s_h
             |  FROM stats),
             |r AS (
             |  SELECT event_type, n_h, s_h,
             |    CAST(n_h AS DOUBLE) * s_h AS weight,
             |    SUM(CAST(n_h AS DOUBLE) * s_h) OVER (ORDER BY event_type
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS running
             |  FROM w),
             |t AS (SELECT event_type, n_h, s_h, weight,
             |    MAX(running) OVER () AS total FROM r)
             |SELECT event_type, n_h, s_h,
             |  weight / total AS alloc_share,
             |  CAST(floor(10000.0 * (weight / total)) AS BIGINT) AS alloc_n
             |FROM t ORDER BY event_type""".stripMargin)),

    // EXT — population-stability-index (PSI) drift report: value
    // distribution of the first time-half vs the second, over FIXED
    // 50-unit bins (the q145 discipline — data-dependent quantile bins
    // would need a global rank). Bin ids come from exact integer-cents
    // floor-division; counts are exact; the only float work is the
    // smoothed share division and the ln() term, identical shapes in
    // both engines. The split point is the integer midpoint of the
    // corpus time range (one broadcast 1-row frame); the PSI total
    // accumulates over the 10-row ordered bin frame.
    EngineQuery("q161_psi_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            (money(col("value")) * 100).cast("long").as("cents"))
        // integer midpoint via BIGINT floor-div — a double round-trip
        // would round differently on the long cast in the two engines
        val mid = ev.agg(expr(
          "min(ts_us) + (max(ts_us) - min(ts_us)) div 2").as("mid_us"))
        val binned = ev.crossJoin(broadcast(mid))
          .select(least(expr("cents div 5000"), lit(9L)).as("bin"),
            when(col("ts_us") < col("mid_us"), 0).otherwise(1).as("half"))
          .groupBy("bin")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"))
        val wAll = Window.partitionBy()
        val wRun = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)
        val p0 = (col("n0").cast("double") + lit(0.5)) /
          (col("t0").cast("double") + lit(5.0))
        val p1 = (col("n1").cast("double") + lit(0.5)) /
          (col("t1").cast("double") + lit(5.0))
        binned
          .withColumn("t0", sum(col("n0")).over(wAll))
          .withColumn("t1", sum(col("n1")).over(wAll))
          .withColumn("p0", p0)
          .withColumn("p1", p1)
          // round the term BEFORE accumulating: ln() is libm (±1 ulp
          // across engines); summing identical 6-decimal terms keeps
          // the running total bit-identical too
          .withColumn("psi_term",
            round((col("p1") - col("p0")) * log(col("p1") / col("p0")), 6))
          .withColumn("psi_running", sum(col("psi_term")).over(wRun))
          .select(col("bin"), col("n0"), col("n1"), col("p0"), col("p1"),
            col("psi_term"), col("psi_running"))
          .orderBy("bin")
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) AS ts_us,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM events),
             |mid AS (
             |  SELECT MIN(ts_us) + (MAX(ts_us) - MIN(ts_us)) // 2
             |    AS mid_us
             |  FROM ev),
             |binned AS (
             |  SELECT LEAST(cents // 5000, 9) AS bin,
             |    CAST(SUM(CASE WHEN ts_us < mid_us THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n0,
             |    CAST(SUM(CASE WHEN ts_us >= mid_us THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n1
             |  FROM ev CROSS JOIN mid GROUP BY 1),
             |tot AS (
             |  SELECT bin, n0, n1,
             |    CAST(SUM(n0) OVER () AS BIGINT) AS t0,
             |    CAST(SUM(n1) OVER () AS BIGINT) AS t1
             |  FROM binned),
             |terms AS (
             |  SELECT bin, n0, n1,
             |    (CAST(n0 AS DOUBLE) + 0.5) / (CAST(t0 AS DOUBLE) + 5.0)
             |      AS p0,
             |    (CAST(n1 AS DOUBLE) + 0.5) / (CAST(t1 AS DOUBLE) + 5.0)
             |      AS p1
             |  FROM tot),
             |psi AS (
             |  SELECT bin, n0, n1, p0, p1,
             |    round((p1 - p0) * ln(p1 / p0), 6) AS psi_term
             |  FROM terms)
             |SELECT bin, n0, n1, p0, p1, psi_term,
             |  SUM(psi_term) OVER (ORDER BY bin
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS psi_running
             |FROM psi ORDER BY bin""".stripMargin)),

    // EXT — Kaplan-Meier survival of view→purchase conversion: the
    // censoring-aware upgrade of q150's converter-only lags. Durations
    // are exact integer days (converters: first purchase − first view;
    // non-converters: censored at corpus end). The at-risk counts and
    // event counts are exact BIGINTs via running sums over the
    // |distinct days| frame (bounded by the corpus time span); the
    // survival curve is exp(Σ ln(1 − d/n)) accumulated in rank order,
    // with the d = n collapse guarded by an exact integer predicate
    // (survival pins to 0 from that day on, never ln(0)).
    EngineQuery("q163_km_survival",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        val maxTs = ev.agg(max("ts_us").as("max_us"))
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_us").as("first_view_us"))
        val fp = ev.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("ts_us") >= col("first_view_us"))
          .groupBy("user_id").agg(min("ts_us").as("first_purchase_us"))
        // BIGINT floor-div day bucketing — `div` truncation matches
        // DuckDB `//` exactly for these nonnegative durations
        val durs = fv.join(fp, Seq("user_id"), "left")
          .crossJoin(broadcast(maxTs))
          .select(
            when(col("first_purchase_us").isNotNull,
              expr("(first_purchase_us - first_view_us) div 86400000000"))
              .otherwise(
                expr("(max_us - first_view_us) div 86400000000"))
              .as("t_days"),
            when(col("first_purchase_us").isNotNull, 1L).otherwise(0L)
              .as("ev"))
        val byDay = durs.groupBy("t_days")
          .agg(sum(col("ev")).as("d"),
            sum(lit(1L) - col("ev")).as("c"))
        val wRun = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wPrev = Window.orderBy("t_days")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy()
        byDay
          .withColumn("total", sum(col("d") + col("c")).over(wAll))
          .withColumn("gone",
            coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
          .withColumn("n_risk", col("total") - col("gone"))
          .withColumn("ln_term",
            when(col("d") < col("n_risk"),
              log((col("n_risk") - col("d")).cast("double") /
                col("n_risk").cast("double"))).otherwise(lit(0.0)))
          .withColumn("collapsed",
            max(when(col("d") === col("n_risk"), 1L).otherwise(0L))
              .over(wRun))
          .withColumn("run_ln", sum(col("ln_term")).over(wRun))
          // round(6): ln/exp are libm, not correctly-rounded IEEE — the
          // engines drift a final ulp; 6 decimals absorbs it
          .select(col("t_days"), col("n_risk"), col("d").as("d_events"),
            col("c").as("n_censored"),
            when(col("collapsed") === 1L, lit(0.0))
              .otherwise(round(exp(col("run_ln")), 6)).as("survival"))
          .orderBy("t_days")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS ts_us
             |  FROM events),
             |mx AS (SELECT MAX(ts_us) AS max_us FROM ev),
             |fv AS (
             |  SELECT user_id, MIN(ts_us) AS first_view_us
             |  FROM ev WHERE event_type = 'view' GROUP BY 1),
             |fp AS (
             |  SELECT e.user_id, MIN(e.ts_us) AS first_purchase_us
             |  FROM ev e JOIN fv ON fv.user_id = e.user_id
             |  WHERE e.event_type = 'purchase'
             |    AND e.ts_us >= fv.first_view_us
             |  GROUP BY 1),
             |durs AS (
             |  SELECT
             |    CASE WHEN fp.first_purchase_us IS NOT NULL
             |      THEN (fp.first_purchase_us - fv.first_view_us)
             |        // 86400000000
             |      ELSE (mx.max_us - fv.first_view_us)
             |        // 86400000000 END AS t_days,
             |    CASE WHEN fp.first_purchase_us IS NOT NULL
             |      THEN 1 ELSE 0 END AS ev
             |  FROM fv LEFT JOIN fp ON fp.user_id = fv.user_id
             |  CROSS JOIN mx),
             |byday AS (
             |  SELECT t_days, CAST(SUM(ev) AS BIGINT) AS d,
             |    CAST(SUM(1 - ev) AS BIGINT) AS c
             |  FROM durs GROUP BY 1),
             |risk AS (
             |  SELECT t_days, d, c,
             |    CAST(SUM(d + c) OVER () AS BIGINT) AS total,
             |    CAST(COALESCE(SUM(d + c) OVER (ORDER BY t_days
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS gone
             |  FROM byday),
             |terms AS (
             |  SELECT t_days, d, c, total - gone AS n_risk,
             |    CASE WHEN d < total - gone
             |      THEN ln(CAST((total - gone) - d AS DOUBLE)
             |        / CAST(total - gone AS DOUBLE))
             |      ELSE CAST(0.0 AS DOUBLE) END AS ln_term,
             |    CASE WHEN d = total - gone THEN 1 ELSE 0 END AS coll
             |  FROM risk),
             |curve AS (
             |  SELECT t_days, n_risk, d, c,
             |    MAX(coll) OVER (ORDER BY t_days
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS collapsed,
             |    SUM(ln_term) OVER (ORDER BY t_days
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS run_ln
             |  FROM terms)
             |SELECT t_days, n_risk, d AS d_events, c AS n_censored,
             |  CASE WHEN collapsed = 1 THEN CAST(0.0 AS DOUBLE)
             |  ELSE round(exp(run_ln), 6) END AS survival
             |FROM curve ORDER BY t_days""".stripMargin)),

    // EXT — burstiness profile: per event_type, the Fano factor
    // (variance-to-mean ratio of daily counts — 1 under Poisson
    // arrivals, >1 bursty) and coefficient of variation. Daily counts
    // are exact BIGINTs; mean/variance come from exact sums through
    // fixed-shape double arithmetic. Two keyed aggregations, the
    // second over the bounded |type × day| frame.
    EngineQuery("q165_fano_burstiness",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"),
            datediff(col("ts").cast("date"),
              lit("1990-01-01").cast("date")).cast("long").as("x"))
          .groupBy("event_type", "x")
          .agg(count(lit(1)).as("c"))
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            sum(col("c")).as("sx"),
            sum(col("c") * col("c")).as("sxx"))
        val nd = col("n_days").cast("double")
        val sxd = col("sx").cast("double")
        val mean = sxd / nd
        val variance = (nd * col("sxx").cast("double") - sxd * sxd) /
          (nd * (nd - lit(1.0)))
        stats.select(col("event_type"), col("n_days"),
            mean.as("mean_daily"), variance.as("var_daily"),
            (variance / mean).as("fano"),
            (sqrt(variance) / mean).as("cv"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', DATE '1990-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) AS x,
             |    COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, COUNT(*) AS n_days,
             |    CAST(SUM(c) AS BIGINT) AS sx,
             |    CAST(SUM(c * c) AS BIGINT) AS sxx
             |  FROM daily GROUP BY 1)
             |SELECT event_type, n_days,
             |  CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily,
             |  (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |  / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))
             |    AS var_daily,
             |  ((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |  / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
             |  / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) AS fano,
             |  sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |  / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
             |  / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) AS cv
             |FROM stats ORDER BY event_type""".stripMargin)),

    // EXT — CUSUM change-point detection: per event_type, the running
    // cumulative deviation of daily counts from the type mean, and the
    // day where |CUSUM| peaks — the classic level-shift locator. Daily
    // counts and means come from exact integers; the CUSUM accumulates
    // over the bounded per-type day frame in day order (sequential adds
    // in both engines), and the peak row is a rank-1 pick with an
    // exact-integer day tie-break.
    EngineQuery("q166_cusum_changepoint",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"),
            datediff(col("ts").cast("date"),
              lit("1990-01-01").cast("date")).cast("long").as("x"))
          .groupBy("event_type", "x")
          .agg(count(lit(1)).as("c"))
        val stats = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sx"))
        val wRun = Window.partitionBy("event_type").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cusumed = daily.join(broadcast(stats), "event_type")
          .withColumn("dev", col("c").cast("double") -
            col("sx").cast("double") / col("n_days").cast("double"))
          .withColumn("cusum", sum(col("dev")).over(wRun))
        val wRank = Window.partitionBy("event_type")
          .orderBy(abs(col("cusum")).desc, col("x"))
        cusumed.withColumn("rnk", row_number().over(wRank))
          .filter(col("rnk") === 1)
          .select(col("event_type"), col("x").as("cp_day"),
            col("c").as("count_at_cp"), col("cusum").as("cusum_at_cp"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', DATE '1990-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) AS x,
             |    COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, COUNT(*) AS n_days,
             |    CAST(SUM(c) AS BIGINT) AS sx
             |  FROM daily GROUP BY 1),
             |cus AS (
             |  SELECT d.event_type, d.x, d.c,
             |    SUM(CAST(d.c AS DOUBLE)
             |      - CAST(s.sx AS DOUBLE) / CAST(s.n_days AS DOUBLE))
             |      OVER (PARTITION BY d.event_type ORDER BY d.x
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cusum
             |  FROM daily d JOIN stats s ON s.event_type = d.event_type),
             |ranked AS (
             |  SELECT event_type, x, c, cusum,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY abs(cusum) DESC, x) AS rnk
             |  FROM cus)
             |SELECT event_type, x AS cp_day, c AS count_at_cp,
             |  cusum AS cusum_at_cp
             |FROM ranked WHERE rnk = 1
             |ORDER BY event_type""".stripMargin)),

    // EXT — daily bounce rate: share of 30-minute gap sessions that
    // contain exactly one event, per session-start day — the product-
    // analytics rollup of q24's sessionization (same session_window
    // operator, same 30-minute gap; the oracle replays the gap-flag
    // running-sum construction). Session build is the q24 plan (per-user
    // merge, parallel across the user hash); the rollup is one keyed
    // aggregation over |sessions| rows.
    EngineQuery("q168_bounce_rate",
      (s, dir) => {
        val sessions = Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("session_window.start").cast("date").as("day"),
            col("n_events"))
        sessions.groupBy("day")
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1, 1L).otherwise(0L))
              .as("n_bounces"))
          .select(col("day"), col("n_sessions"), col("n_bounces"),
            (col("n_bounces").cast("double") /
              col("n_sessions").cast("double")).as("bounce_rate"))
          .orderBy("day")
      },
      Some("""WITH flags AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts,
             |    SUM(new_session) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS session_id
             |  FROM flags),
             |agg AS (
             |  SELECT user_id, session_id,
             |    CAST(MIN(ts) AS DATE) AS day, COUNT(*) AS n_events
             |  FROM sess GROUP BY 1, 2),
             |daily AS (
             |  SELECT day, COUNT(*) AS n_sessions,
             |    CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_bounces
             |  FROM agg GROUP BY 1)
             |SELECT day, n_sessions, n_bounces,
             |  CAST(n_bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE)
             |    AS bounce_rate
             |FROM daily ORDER BY day""".stripMargin)),

    // EXT — weekly churn: per week, users active that week who do NOT
    // return the next week — the retention complement of q94's cohort
    // triangle (weeks, not months: the corpus spans one calendar month
    // at every SF). Activity is one distinct-aggregation; the churn
    // check is a self left-join on (user, week+1); the final week (no
    // next-week data) is excluded via a broadcast 1-row max. All
    // integers until one rate division; the week index is BIGINT
    // floor-division of epoch days (the `div`/`//` parity rule).
    EngineQuery("q171_weekly_churn",
      (s, dir) => {
        val am = Tables.events(s, dir)
          .select(col("user_id"),
            datediff(col("ts").cast("date"),
              lit("1990-01-01").cast("date")).cast("long").as("d"))
          .select(col("user_id"), expr("d div 7").as("m"))
          .distinct()
        val maxM = am.agg(max("m").as("max_m"))
        val nxt = am.select(col("user_id"), (col("m") - 1).as("m"))
          .withColumn("returns", lit(1L)).distinct()
        am.join(nxt, Seq("user_id", "m"), "left")
          .crossJoin(broadcast(maxM))
          .filter(col("m") < col("max_m"))
          .groupBy("m")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("returns").isNull, 1L).otherwise(0L))
              .as("n_churned"))
          .select(col("m").as("week_idx"), col("n_active"),
            col("n_churned"),
            (col("n_churned").cast("double") /
              col("n_active").cast("double")).as("churn_rate"))
          .orderBy("week_idx")
      },
      Some("""WITH am AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_diff('day', DATE '1990-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) // 7 AS m
             |  FROM events),
             |mx AS (SELECT MAX(m) AS max_m FROM am),
             |nxt AS (
             |  SELECT DISTINCT user_id, m - 1 AS m, 1 AS returns FROM am),
             |j AS (
             |  SELECT am.m, am.user_id, nxt.returns
             |  FROM am LEFT JOIN nxt
             |    ON nxt.user_id = am.user_id AND nxt.m = am.m
             |  CROSS JOIN mx WHERE am.m < mx.max_m)
             |SELECT m AS week_idx, COUNT(*) AS n_active,
             |  CAST(SUM(CASE WHEN returns IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_churned,
             |  CAST(SUM(CASE WHEN returns IS NULL THEN 1 ELSE 0 END)
             |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS churn_rate
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — top event paths: the 20 most frequent length-3 event-type
    // sequences across user timelines — q151's transition matrix
    // extended to path mining (the "how do users actually move"
    // report). Two leads over the per-user window (parallel across
    // users), one keyed aggregation, top-20 via orderBy+limit
    // (TakeOrdered — map-side partial top-k). Count ties at the cut
    // break on the exact path strings.
    EngineQuery("q173_top_paths",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
            col("t3").as("step3"))
          .agg(count(lit(1)).as("n_paths"))
          .orderBy(col("n_paths").desc, col("step1"), col("step2"),
            col("step3"))
          .limit(20)
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS step1,
             |    lead(event_type, 1) OVER w AS step2,
             |    lead(event_type, 2) OVER w AS step3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT step1, step2, step3, COUNT(*) AS n_paths
             |FROM seq WHERE step3 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY n_paths DESC, step1, step2, step3
             |LIMIT 20""".stripMargin)),

    // EXT — session basket pairs: UNORDERED event-type co-occurrence
    // within 30-minute sessions, with support and lift — market-basket
    // analysis over q24's session definition (the order-free complement
    // of q173's paths). Per-session distinct types explode to a<b pairs
    // via a bounded self-join on the session key (≤ |types|² rows per
    // session); supports are exact counts and lift is one fixed-shape
    // division chain from them.
    EngineQuery("q177_basket_pairs",
      (s, dir) => {
        val sess = Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes"),
            col("user_id"))
          .agg(collect_set(col("event_type")).as("types"))
          .select(monotonically_increasing_id().as("sid"), col("types"))
        val st = sess.select(col("sid"), explode(col("types")).as("t"))
        val nSess = sess.agg(count(lit(1)).as("n_sessions"))
        val single = st.groupBy("t").agg(count(lit(1)).as("c_t"))
        val pairs = st.join(st.withColumnRenamed("t", "t2"), "sid")
          .filter(col("t") < col("t2"))
          .groupBy(col("t").as("type_a"), col("t2").as("type_b"))
          .agg(count(lit(1)).as("c_ab"))
        pairs
          .join(broadcast(single.withColumnRenamed("t", "type_a")
            .withColumnRenamed("c_t", "c_a")), "type_a")
          .join(broadcast(single.withColumnRenamed("t", "type_b")
            .withColumnRenamed("c_t", "c_b")), "type_b")
          .crossJoin(broadcast(nSess))
          .select(col("type_a"), col("type_b"), col("c_ab"), col("c_a"),
            col("c_b"),
            (col("c_ab").cast("double") / col("n_sessions").cast("double"))
              .as("support"),
            ((col("c_ab").cast("double") / col("n_sessions").cast("double"))
              / ((col("c_a").cast("double") /
                  col("n_sessions").cast("double")) *
                (col("c_b").cast("double") /
                  col("n_sessions").cast("double")))).as("lift"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH flags AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, event_type,
             |    SUM(new_session) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS session_id
             |  FROM flags),
             |st AS (
             |  SELECT DISTINCT user_id, session_id, event_type AS t
             |  FROM sess),
             |ns AS (
             |  SELECT COUNT(*) AS n_sessions FROM
             |    (SELECT DISTINCT user_id, session_id FROM st)),
             |single AS (SELECT t, COUNT(*) AS c_t FROM st GROUP BY 1),
             |pairs AS (
             |  SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS c_ab
             |  FROM st a JOIN st b
             |    ON b.user_id = a.user_id AND b.session_id = a.session_id
             |    AND b.t > a.t
             |  GROUP BY 1, 2)
             |SELECT p.type_a, p.type_b, p.c_ab, sa.c_t AS c_a,
             |  sb.c_t AS c_b,
             |  CAST(p.c_ab AS DOUBLE) / CAST(ns.n_sessions AS DOUBLE)
             |    AS support,
             |  (CAST(p.c_ab AS DOUBLE) / CAST(ns.n_sessions AS DOUBLE))
             |  / ((CAST(sa.c_t AS DOUBLE) / CAST(ns.n_sessions AS DOUBLE))
             |    * (CAST(sb.c_t AS DOUBLE) / CAST(ns.n_sessions AS DOUBLE)))
             |    AS lift
             |FROM pairs p
             |JOIN single sa ON sa.t = p.type_a
             |JOIN single sb ON sb.t = p.type_b
             |CROSS JOIN ns
             |ORDER BY p.type_a, p.type_b""".stripMargin)),

    // EXT — conversion-lag SLO percentiles: p50/p90/p99 of the q150
    // view→purchase lag in minutes — the latency-objective numbers an
    // on-call dashboard quotes. Lags are exact microsecond BIGINTs;
    // percentiles are the exact interpolated (R-7) aggregate over the
    // |converting users| frame — the q91 trade-off, documented there
    // (at warehouse scale swap in the q58 sketch). One row.
    EngineQuery("q189_lag_percentiles",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_us").as("first_view_us"))
        val fp = ev.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("ts_us") >= col("first_view_us"))
          .groupBy("user_id").agg(min("ts_us").as("first_purchase_us"))
        fv.join(fp, "user_id")
          .select(((col("first_purchase_us") - col("first_view_us"))
            .cast("double") / lit(60000000.0)).as("lag_min"))
          .agg(count(lit(1)).as("n_converted"),
            round(expr("percentile(lag_min, 0.5)"), 6).as("p50_min"),
            round(expr("percentile(lag_min, 0.9)"), 6).as("p90_min"),
            round(expr("percentile(lag_min, 0.99)"), 6).as("p99_min"))
      },
      Some("""WITH fv AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS first_view_us
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |fp AS (
             |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
             |  FROM events e JOIN fv ON fv.user_id = e.user_id
             |  WHERE e.event_type = 'purchase'
             |    AND epoch_us(e.ts) >= fv.first_view_us
             |  GROUP BY 1),
             |lags AS (
             |  SELECT CAST(fp.first_purchase_us - fv.first_view_us
             |    AS DOUBLE) / 60000000.0 AS lag_min
             |  FROM fv JOIN fp ON fp.user_id = fv.user_id)
             |SELECT COUNT(*) AS n_converted,
             |  round(quantile_cont(lag_min, 0.5), 6) AS p50_min,
             |  round(quantile_cont(lag_min, 0.9), 6) AS p90_min,
             |  round(quantile_cont(lag_min, 0.99), 6) AS p99_min
             |FROM lags""".stripMargin)),

    // EXT — retention curve: q94's cohort triangle rolled up to the
    // average week-N retention rate across cohorts — the single curve
    // a growth report plots. Per-cohort offsets join their cohort-size
    // base (offset 0) and the cross-cohort average weights cohorts by
    // size (exact integer sums, one division at the end).
    EngineQuery("q190_retention_curve",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
        val cohort = ev.groupBy("user_id")
          .agg(min(col("ts")).as("first_ts"))
          .select(col("user_id"),
            date_trunc("week", col("first_ts")).as("cohort_week"))
        val active = ev
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .distinct()
        val tri = active.join(cohort, Seq("user_id"))
          .select(col("cohort_week"),
            floor(datediff(col("week"), col("cohort_week"))
              .cast("double") / 7.0).cast("long").as("week_offset"))
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"))
        val base = tri.filter(col("week_offset") === 0)
          .select(col("cohort_week"), col("n_users").as("n_base"))
        tri.join(base, "cohort_week")
          .groupBy("week_offset")
          .agg(count(lit(1)).as("n_cohorts"),
            sum(col("n_users")).as("n_retained"),
            sum(col("n_base")).as("n_base_total"))
          .select(col("week_offset"), col("n_cohorts"),
            col("n_retained"), col("n_base_total"),
            (col("n_retained").cast("double") /
              col("n_base_total").cast("double")).as("retention_rate"))
          .orderBy("week_offset")
      },
      Some("""WITH cohort AS (
             |  SELECT user_id,
             |    CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP)
             |      AS cohort_week
             |  FROM events GROUP BY 1),
             |active AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
             |  FROM events),
             |tri AS (
             |  SELECT cohort_week,
             |    CAST(floor(datediff('day', CAST(cohort_week AS DATE),
             |      CAST(week AS DATE)) / 7.0) AS BIGINT) AS week_offset,
             |    COUNT(*) AS n_users
             |  FROM active JOIN cohort USING (user_id)
             |  GROUP BY 1, 2),
             |base AS (
             |  SELECT cohort_week, n_users AS n_base FROM tri
             |  WHERE week_offset = 0)
             |SELECT week_offset, COUNT(*) AS n_cohorts,
             |  CAST(SUM(n_users) AS BIGINT) AS n_retained,
             |  CAST(SUM(n_base) AS BIGINT) AS n_base_total,
             |  CAST(SUM(n_users) AS DOUBLE) / CAST(SUM(n_base) AS DOUBLE)
             |    AS retention_rate
             |FROM tri JOIN base USING (cohort_week)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — Wilson score intervals: the 95% confidence interval for
    // each event type's ≥14-event engagement rate (q153's conversion
    // definition) — the error bars a dashboard should draw instead of
    // bare rates. Exact counts in, one fixed-shape double formula out
    // (z = 1.96 inlined as a literal; sqrt is IEEE-exact).
    EngineQuery("q192_wilson_intervals",
      (s, dir) => {
        val perUser = Tables.events(s, dir)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n_ev"))
        val users = Tables.events(s, dir).select("user_id").distinct()
          .agg(count(lit(1)).as("n_users"))
        val conv = perUser.groupBy("event_type")
          .agg(sum(when(col("n_ev") >= 14, 1L).otherwise(0L)).as("c"))
          .crossJoin(broadcast(users))
        val nd = col("n_users").cast("double")
        val p = col("c").cast("double") / nd
        val z2 = lit(3.8416) // 1.96²
        val denom = lit(1.0) + z2 / nd
        val center = (p + z2 / (lit(2.0) * nd)) / denom
        val half = (lit(1.96) * sqrt(p * (lit(1.0) - p) / nd +
          z2 / (lit(4.0) * (nd * nd)))) / denom
        conv.select(col("event_type"), col("n_users"), col("c"),
            p.as("rate"), (center - half).as("wilson_lo"),
            (center + half).as("wilson_hi"))
          .orderBy("event_type")
      },
      Some("""WITH pu AS (
             |  SELECT user_id, event_type, COUNT(*) AS n_ev
             |  FROM events GROUP BY 1, 2),
             |us AS (
             |  SELECT COUNT(*) AS n_users FROM
             |    (SELECT DISTINCT user_id FROM events)),
             |conv AS (
             |  SELECT event_type,
             |    CAST(SUM(CASE WHEN n_ev >= 14 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS c
             |  FROM pu GROUP BY 1)
             |SELECT event_type, n_users, c,
             |  CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate,
             |  ((CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE)
             |      + 3.8416 / (2.0 * CAST(n_users AS DOUBLE)))
             |    / (1.0 + 3.8416 / CAST(n_users AS DOUBLE)))
             |  - ((1.96 * sqrt(
             |      (CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      * (1.0 - CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      / CAST(n_users AS DOUBLE)
             |      + 3.8416 / (4.0 * (CAST(n_users AS DOUBLE)
             |          * CAST(n_users AS DOUBLE)))))
             |    / (1.0 + 3.8416 / CAST(n_users AS DOUBLE)))
             |    AS wilson_lo,
             |  ((CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE)
             |      + 3.8416 / (2.0 * CAST(n_users AS DOUBLE)))
             |    / (1.0 + 3.8416 / CAST(n_users AS DOUBLE)))
             |  + ((1.96 * sqrt(
             |      (CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      * (1.0 - CAST(c AS DOUBLE) / CAST(n_users AS DOUBLE))
             |      / CAST(n_users AS DOUBLE)
             |      + 3.8416 / (4.0 * (CAST(n_users AS DOUBLE)
             |          * CAST(n_users AS DOUBLE)))))
             |    / (1.0 + 3.8416 / CAST(n_users AS DOUBLE)))
             |    AS wilson_hi
             |FROM conv CROSS JOIN us
             |ORDER BY event_type""".stripMargin)),

    // EXT — A/B power analysis: for each target type's observed q153
    // cohort rates, the per-arm sample size needed to detect the
    // OBSERVED lift at α = 0.05 (two-sided) and 80% power —
    // n = (z_α/2 + z_β)²·(p0(1−p0) + p1(1−p1)) / (p1−p0)², with the
    // normal quantiles inlined as literals (1.96, 0.8416). Exact
    // counts in, one fixed-shape double chain out; the zero-lift
    // degenerate case guards to NULL on an exact integer predicate
    // (equal counts in equal-size cohorts ⇒ equal rates).
    EngineQuery("q195_power_analysis",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            pmod(col("user_id"), lit(2)).as("cohort"))
        val sizes = ev.select(col("user_id"), col("cohort")).distinct()
          .agg(sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n1"))
        val perUser = ev.groupBy("user_id", "cohort", "event_type")
          .agg(count(lit(1)).as("n_ev"))
        val conv = perUser
          .groupBy(col("event_type").as("target_type"))
          .agg(sum(when(col("cohort") === 0 && col("n_ev") >= 14, 1L)
            .otherwise(0L)).as("c0"),
            sum(when(col("cohort") === 1 && col("n_ev") >= 14, 1L)
              .otherwise(0L)).as("c1"))
        val j = conv.crossJoin(broadcast(sizes))
        val p0 = col("c0").cast("double") / col("n0").cast("double")
        val p1 = col("c1").cast("double") / col("n1").cast("double")
        val zsum2 = lit(7.849) // (1.96 + 0.8416)²
        val nReq = zsum2 *
          (p0 * (lit(1.0) - p0) + p1 * (lit(1.0) - p1)) /
          ((p1 - p0) * (p1 - p0))
        val degenerate = col("c0") * col("n1") === col("c1") * col("n0")
        j.select(col("target_type"), col("c0"), col("c1"),
            p0.as("p0"), p1.as("p1"),
            when(degenerate, lit(null).cast("double"))
              .otherwise((p1 - p0)).as("observed_lift"),
            when(degenerate, lit(null).cast("long"))
              .otherwise(ceil(nReq).cast("long")).as("n_per_arm_80pct"))
          .orderBy("target_type")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, user_id % 2 AS cohort
             |  FROM events),
             |sizes AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n0,
             |    CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1
             |  FROM (SELECT DISTINCT user_id, cohort FROM ev)),
             |pu AS (
             |  SELECT user_id, cohort, event_type, COUNT(*) AS n_ev
             |  FROM ev GROUP BY 1, 2, 3),
             |conv AS (
             |  SELECT event_type AS target_type,
             |    CAST(SUM(CASE WHEN cohort = 0 AND n_ev >= 14
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             |    CAST(SUM(CASE WHEN cohort = 1 AND n_ev >= 14
             |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
             |  FROM pu GROUP BY 1)
             |SELECT target_type, c0, c1,
             |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
             |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
             |  CASE WHEN c0 * n1 = c1 * n0 THEN NULL
             |  ELSE CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) END
             |    AS observed_lift,
             |  CASE WHEN c0 * n1 = c1 * n0 THEN NULL
             |  ELSE CAST(ceil(
             |    7.849
             |    * ((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |        * (1.0 - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      + (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |        * (1.0 - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
             |    / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |        - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |        - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))))
             |    AS BIGINT) END AS n_per_arm_80pct
             |FROM conv CROSS JOIN sizes
             |ORDER BY target_type""".stripMargin)),

    // EXT — Welch's unequal-variance t-test: each event type's mean
    // value against all OTHER types — the "is this segment actually
    // different" screen, with the Welch–Satterthwaite degrees of
    // freedom. The complement's sufficient statistics come from one
    // broadcast 1-row total minus the group's own (never a second
    // scan); everything is exact DECIMAL/BIGINT until one fixed-shape
    // double chain.
    EngineQuery("q180_welch_ttest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), money(col("value")).as("v"))
        val per = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n1"),
            sum(col("v")).cast("double").as("s1"),
            sum(col("v") * col("v")).cast("double").as("ss1"))
        val tot = ev.agg(count(lit(1)).as("nt"),
          sum(col("v")).cast("double").as("st"),
          sum(col("v") * col("v")).cast("double").as("sst"))
        val j = per.crossJoin(broadcast(tot))
        val n1d = col("n1").cast("double")
        val n0d = (col("nt") - col("n1")).cast("double")
        val s0 = col("st") - col("s1")
        val ss0 = col("sst") - col("ss1")
        val m1 = col("s1") / n1d
        val m0 = s0 / n0d
        val v1 = (n1d * col("ss1") - col("s1") * col("s1")) /
          (n1d * (n1d - lit(1.0)))
        val v0 = (n0d * ss0 - s0 * s0) / (n0d * (n0d - lit(1.0)))
        val se2 = v1 / n1d + v0 / n0d
        val tStat = (m1 - m0) / sqrt(se2)
        val df = (se2 * se2) /
          ((v1 / n1d) * (v1 / n1d) / (n1d - lit(1.0)) +
            (v0 / n0d) * (v0 / n0d) / (n0d - lit(1.0)))
        j.select(col("event_type"), col("n1").as("n_in"),
            m1.as("mean_in"), m0.as("mean_rest"), tStat.as("t_welch"),
            df.as("df_welch"))
          .orderBy("event_type")
      },
      Some("""WITH per AS (
             |  SELECT event_type, COUNT(*) AS n1,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))
             |      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss1
             |  FROM events GROUP BY 1),
             |tot AS (
             |  SELECT COUNT(*) AS nt,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS st,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))
             |      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sst
             |  FROM events)
             |SELECT event_type, n1 AS n_in,
             |  s1 / CAST(n1 AS DOUBLE) AS mean_in,
             |  (st - s1) / CAST(nt - n1 AS DOUBLE) AS mean_rest,
             |  (s1 / CAST(n1 AS DOUBLE)
             |    - (st - s1) / CAST(nt - n1 AS DOUBLE))
             |  / sqrt(
             |      (CAST(n1 AS DOUBLE) * ss1 - s1 * s1)
             |        / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |        / CAST(n1 AS DOUBLE)
             |      + (CAST(nt - n1 AS DOUBLE) * (sst - ss1)
             |          - (st - s1) * (st - s1))
             |        / (CAST(nt - n1 AS DOUBLE)
             |          * (CAST(nt - n1 AS DOUBLE) - 1.0))
             |        / CAST(nt - n1 AS DOUBLE)) AS t_welch,
             |  ((((CAST(n1 AS DOUBLE) * ss1 - s1 * s1)
             |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |      / CAST(n1 AS DOUBLE))
             |    + ((CAST(nt - n1 AS DOUBLE) * (sst - ss1)
             |        - (st - s1) * (st - s1))
             |      / (CAST(nt - n1 AS DOUBLE)
             |        * (CAST(nt - n1 AS DOUBLE) - 1.0))
             |      / CAST(nt - n1 AS DOUBLE)))
             |  * (((CAST(n1 AS DOUBLE) * ss1 - s1 * s1)
             |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |      / CAST(n1 AS DOUBLE))
             |    + ((CAST(nt - n1 AS DOUBLE) * (sst - ss1)
             |        - (st - s1) * (st - s1))
             |      / (CAST(nt - n1 AS DOUBLE)
             |        * (CAST(nt - n1 AS DOUBLE) - 1.0))
             |      / CAST(nt - n1 AS DOUBLE))))
             |  / (((CAST(n1 AS DOUBLE) * ss1 - s1 * s1)
             |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |      / CAST(n1 AS DOUBLE))
             |    * ((CAST(n1 AS DOUBLE) * ss1 - s1 * s1)
             |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
             |      / CAST(n1 AS DOUBLE))
             |    / (CAST(n1 AS DOUBLE) - 1.0)
             |    + ((CAST(nt - n1 AS DOUBLE) * (sst - ss1)
             |        - (st - s1) * (st - s1))
             |      / (CAST(nt - n1 AS DOUBLE)
             |        * (CAST(nt - n1 AS DOUBLE) - 1.0))
             |      / CAST(nt - n1 AS DOUBLE))
             |    * ((CAST(nt - n1 AS DOUBLE) * (sst - ss1)
             |        - (st - s1) * (st - s1))
             |      / (CAST(nt - n1 AS DOUBLE)
             |        * (CAST(nt - n1 AS DOUBLE) - 1.0))
             |      / CAST(nt - n1 AS DOUBLE))
             |    / (CAST(nt - n1 AS DOUBLE) - 1.0)) AS df_welch
             |FROM per CROSS JOIN tot
             |ORDER BY event_type""".stripMargin)),

    // EXT — EXACT rolling 7-day DISTINCT active users per day: the
    // windowed-distinct aggregate no engine's plain window frames can
    // express (COUNT(DISTINCT) OVER a moving frame is unsupported in
    // both Spark and DuckDB). Spark computes it LINEARLY with the
    // representative-span trick: each (user, active-day) pair
    // represents the window-days [day, min(day+6, next_active−1)] —
    // for any window day exactly the user's LATEST activity ≤ it can
    // represent it, so exploding each pair into ≤ 7 representative
    // rows and counting per day IS the distinct count, with no
    // quadratic day×activity join and no distinct-in-window state.
    // The per-user lead() is partitioned; the explode is bounded by
    // the window width. The oracle states the semantics directly as
    // the quadratic day-range join + COUNT(DISTINCT) — two maximally
    // different formulations agreeing on every day.
    EngineQuery("q303_rolling_distinct",
      (s, dir) => {
        val pairs = Tables.events(s, dir)
          .select(col("user_id"),
            datediff(col("ts").cast("date"),
              lit("2024-01-01").cast("date")).cast("long").as("d"))
          .distinct()
        val wU = Window.partitionBy("user_id").orderBy("d")
        val spans = pairs.withColumn("nxt", lead("d", 1).over(wU))
          .withColumn("rep_end",
            least(col("d") + 6L,
              coalesce(col("nxt") - 1L, col("d") + 6L)))
        val days = pairs.select(col("d").as("day")).distinct()
        spans.select(col("user_id"),
            explode(sequence(col("d"), col("rep_end"))).as("day"))
          .join(broadcast(days), Seq("day"), "left_semi")
          .groupBy("day")
          .agg(count(lit(1)).as("active_users_7d"))
          .orderBy("day")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT user_id,
             |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS d
             |  FROM events),
             |days AS (SELECT DISTINCT d AS day FROM pairs)
             |SELECT dy.day,
             |  CAST(COUNT(DISTINCT p.user_id) AS BIGINT)
             |    AS active_users_7d
             |FROM days dy
             |JOIN pairs p ON p.d BETWEEN dy.day - 6 AND dy.day
             |GROUP BY 1 ORDER BY day""".stripMargin)),

    // EXT — CALENDAR GAP-FILL + EXACT LINEAR INTERPOLATION of each
    // nation's daily order revenue: densify every (nation, day) cell
    // of the observed span, then fill interior gaps by linear
    // interpolation between the flanking observations — carried
    // ENTIRELY in BIGINT cents with a single integer division
    //   prev + ((next − prev) · (d − pd)) div (nd − pd)
    // so both engines truncate identically (negative slopes exercise
    // the toward-zero rule) and the fill is bit-exact; leading /
    // trailing runs clamp to the nearest observation. The resample /
    // impute step every time-series screen upstream of this registry
    // assumes — and the batch twin of the streaming freshness
    // monitor's "what SHOULD this feed have read" question. Scale
    // shape: the calendar is |nations| × span built by explode over a
    // broadcast 1-row span (never a range join); all four fill
    // windows are PARTITIONED by nation over domain-bounded frames;
    // one keyed left join places the observations.
    EngineQuery("q308_gapfill_interpolate",
      (s, dir) => {
        val daily = Tables.table(s, dir, "orders")
          .join(Tables.table(s, dir, "customer")
              .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            col("o_orderdate").cast("date").as("day"))
          .agg(expr(
            "sum(cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint))")
            .as("cents"))
        val span = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val cal = broadcast(Tables.table(s, dir, "nation")
            .select(col("n_name").as("nation")))
          .crossJoin(broadcast(span))
          .select(col("nation"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val wp = Window.partitionBy("nation").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy("nation").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        cal.join(daily, Seq("nation", "day"), "left")
          .withColumn("prev_c", last(col("cents"), ignoreNulls = true).over(wp))
          .withColumn("prev_d",
            last(when(col("cents").isNotNull, col("day")),
              ignoreNulls = true).over(wp))
          .withColumn("next_c", first(col("cents"), ignoreNulls = true).over(wn))
          .withColumn("next_d",
            first(when(col("cents").isNotNull, col("day")),
              ignoreNulls = true).over(wn))
          .select(col("nation"),
            datediff(col("day"), lit("1995-01-01").cast("date"))
              .cast("long").as("day_idx"),
            col("cents"),
            when(col("cents").isNotNull, col("cents"))
              .when(col("prev_c").isNull, col("next_c"))
              .when(col("next_c").isNull, col("prev_c"))
              .otherwise(expr("""prev_c + ((next_c - prev_c)
                | * cast(datediff(day, prev_d) as bigint))
                | div cast(datediff(next_d, prev_d) as bigint)"""
                .stripMargin))
              .as("filled_cents"),
            when(col("cents").isNotNull, lit("obs"))
              .when(col("prev_c").isNull, lit("lead"))
              .when(col("next_c").isNull, lit("trail"))
              .otherwise(lit("interp")).as("kind"))
          .orderBy("nation", "day_idx")
      },
      Some("""WITH daily AS (
             |  SELECT n.n_name AS nation,
             |    CAST(o.o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
             |      * 100 AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders o
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |  JOIN nation n ON n.n_nationkey = c.c_nationkey
             |  GROUP BY 1, 2),
             |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
             |cal AS (
             |  SELECT n.n_name AS nation, CAST(u.g AS DATE) AS day
             |  FROM nation n CROSS JOIN (
             |    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
             |      AS g FROM span) u),
             |f AS (
             |  SELECT cal.nation, cal.day, d.cents,
             |    last_value(d.cents IGNORE NULLS) OVER wp AS prev_c,
             |    last_value(CASE WHEN d.cents IS NOT NULL THEN cal.day END
             |      IGNORE NULLS) OVER wp AS prev_d,
             |    first_value(d.cents IGNORE NULLS) OVER wn AS next_c,
             |    first_value(CASE WHEN d.cents IS NOT NULL THEN cal.day END
             |      IGNORE NULLS) OVER wn AS next_d
             |  FROM cal LEFT JOIN daily d
             |    ON d.nation = cal.nation AND d.day = cal.day
             |  WINDOW wp AS (PARTITION BY cal.nation ORDER BY cal.day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wn AS (PARTITION BY cal.nation ORDER BY cal.day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT nation,
             |  CAST(day - DATE '1995-01-01' AS BIGINT) AS day_idx, cents,
             |  CAST(CASE WHEN cents IS NOT NULL THEN cents
             |    WHEN prev_c IS NULL THEN next_c
             |    WHEN next_c IS NULL THEN prev_c
             |    ELSE prev_c + ((next_c - prev_c)
             |      * CAST(day - prev_d AS BIGINT))
             |      // CAST(next_d - prev_d AS BIGINT) END AS BIGINT)
             |    AS filled_cents,
             |  CASE WHEN cents IS NOT NULL THEN 'obs'
             |    WHEN prev_c IS NULL THEN 'lead'
             |    WHEN next_c IS NULL THEN 'trail'
             |    ELSE 'interp' END AS kind
             |FROM f ORDER BY nation, day_idx""".stripMargin))
  )
}
