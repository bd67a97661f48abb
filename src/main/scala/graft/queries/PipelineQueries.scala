package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CoreFunctions._

/** Reference ingest-pipeline semantics (SURVEY §2A / §2C Q1–Q8, Q36–Q39)
  * re-expressed over the driver's `events` stream table
  * (event_id, ts, user_id, event_type, value, props-json).
  *
  * Mapping of the reference envelope onto the test schema:
  *   payload          → props (JSON string, `$.k` plays call_id)
  *   trace_id         → event_id (stringified fallback)
  *   tenant_id        → user_id
  *   occurred_at      → ts
  */
object PipelineQueries {

  /** Idempotency key: coalesce(JSON key, stringified event id) —
    * reference validation.js:33-42 priority chain. */
  private def keyCol = coalesce(
    get_json_object(col("props"), "$.k"),
    col("event_id").cast("string"))

  private val keySql =
    "coalesce(json_extract_string(props, '$.k'), CAST(event_id AS VARCHAR))"

  /** Dedup key with natural duplicates: user + JSON k. */
  private def dupKeyCol =
    concat(col("user_id").cast("string"), lit(":"),
      coalesce(get_json_object(col("props"), "$.k"), lit("-")))

  private val dupKeySql =
    "CAST(user_id AS VARCHAR) || ':' || coalesce(json_extract_string(props, '$.k'), '-')"

  val all: Seq[EngineQuery] = Seq(

    // Q1 — envelope validation split (reference validation.js:12-25):
    // required-field presence + timestamp parse, routed by error type.
    EngineQuery("q01_validation_split",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.select(
            col("event_type"),
            (col("event_type").isNotNull && col("ts").isNotNull &&
              col("user_id").isNotNull &&
              get_json_object(col("props"), "$.k").isNotNull)
              .as("is_valid"),
            when(col("event_type").isNull || col("ts").isNull ||
                col("user_id").isNull, lit("missing_fields"))
              .when(get_json_object(col("props"), "$.k").isNull,
                lit("no_idempotency_key"))
              .otherwise(lit("ok")).as("error_type"))
          .groupBy("event_type", "is_valid", "error_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "is_valid", "error_type")
      },
      Some("""SELECT event_type,
             |  (event_type IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
             |   AND json_extract_string(props, '$.k') IS NOT NULL) AS is_valid,
             |  CASE WHEN event_type IS NULL OR ts IS NULL OR user_id IS NULL THEN 'missing_fields'
             |       WHEN json_extract_string(props, '$.k') IS NULL THEN 'no_idempotency_key'
             |       ELSE 'ok' END AS error_type,
             |  COUNT(*) AS n
             |FROM events
             |GROUP BY 1, 2, 3
             |ORDER BY 1, 2, 3""".stripMargin)),

    // Q2 — idempotency-key derivation (coalesce priority chain).
    EngineQuery("q02_idempotency_key",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), keyCol.as("idem_key"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id, $keySql AS idem_key
              |FROM events ORDER BY event_id""".stripMargin)),

    // Q3 — deterministic SHA-256 sampling @ 0.25 (reference sampling.js:15-24,
    // bit-exact: uint32(first 8 hex) / 0xffffffff < rate).
    EngineQuery("q03_deterministic_sample",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), keyCol.as("idem_key"),
          hashBucket(keyCol).as("hash_bucket"))
        .filter(col("hash_bucket") < 0.25)
        .orderBy("event_id"),
      Some(s"""SELECT event_id, idem_key, hash_bucket FROM (
              |  SELECT event_id, $keySql AS idem_key,
              |    CAST('0x' || substr(sha256($keySql), 1, 8) AS BIGINT) / 4294967295.0 AS hash_bucket
              |  FROM events) t
              |WHERE hash_bucket < 0.25
              |ORDER BY event_id""".stripMargin)),

    // Q4 — dedup by key, keep-first by (ts, event_id) (reference bq.js:49
    // insertId semantics, made deterministic).
    EngineQuery("q04_dedup_by_key",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("dup_key"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(dupKeyCol.as("dup_key"), col("event_id"), col("ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .orderBy("dup_key")
      },
      Some(s"""SELECT dup_key, event_id, ts FROM (
              |  SELECT $dupKeySql AS dup_key, event_id, ts,
              |    row_number() OVER (PARTITION BY $dupKeySql ORDER BY ts, event_id) AS rn
              |  FROM events) t
              |WHERE rn = 1 ORDER BY dup_key""".stripMargin)),

    // Q5 — ingest projection / warehouse-row construction (reference
    // bq.js:20-35): casts, coalesce defaults, constant flags.
    EngineQuery("q05_ingest_projection",
      (s, dir) => Tables.events(s, dir)
        .select(
          col("event_id"),
          col("user_id").cast("string").as("tenant_id"),
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("schema_version"),
          lit(1L).as("envelope_version"),
          col("ts").as("occurred_at"),
          coalesce(col("event_type"), lit("unknown")).as("source"),
          lit(true).as("sampled"),
          keyCol.as("idempotency_key"),
          col("props").as("payload"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |  CAST(user_id AS VARCHAR) AS tenant_id,
              |  event_type,
              |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS schema_version,
              |  CAST(1 AS BIGINT) AS envelope_version,
              |  ts AS occurred_at,
              |  coalesce(event_type, 'unknown') AS source,
              |  true AS sampled,
              |  $keySql AS idempotency_key,
              |  props AS payload
              |FROM events ORDER BY event_id""".stripMargin)),

    // Q6 — per-tenant/type counts, the reference's canonical verification
    // query (load-test.js:135): filter + 2-col group + count.
    EngineQuery("q06_counts_by_user_type",
      (s, dir) => Tables.events(s, dir)
        .filter(col("value") >= 100.0)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, COUNT(*) AS n
             |FROM events WHERE value >= 100.0
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q7 — smoke verification (scripts/01_smoke_publish.js:141-154):
    // JSON extraction, date filter, sort desc, limit.
    EngineQuery("q07_smoke_verification",
      (s, dir) => Tables.events(s, dir)
        .filter(to_date(col("ts")) === lit("2024-01-01").cast("date"))
        .select(
          get_json_object(col("props"), "$.k").as("k"),
          get_json_object(col("props"), "$.missing").as("missing"),
          col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .orderBy(col("ts").desc, col("event_id"))
        .limit(50),
      Some("""SELECT json_extract_string(props, '$.k') AS k,
             |  json_extract_string(props, '$.missing') AS missing,
             |  event_id, user_id, event_type, ts
             |FROM events
             |WHERE CAST(ts AS DATE) = DATE '2024-01-01'
             |ORDER BY ts DESC, event_id
             |LIMIT 50""".stripMargin)),

    // Q8 — duplicate-collapse audit (scripts/02_idempotency_test.js:169-176):
    // group by key HAVING count > 1.
    EngineQuery("q08_duplicate_audit",
      (s, dir) => Tables.events(s, dir)
        .groupBy(dupKeyCol.as("dup_key"))
        .agg(count(lit(1)).as("row_count"))
        .filter(col("row_count") > 1)
        .orderBy("dup_key"),
      Some(s"""SELECT $dupKeySql AS dup_key, COUNT(*) AS row_count
              |FROM events GROUP BY 1 HAVING COUNT(*) > 1
              |ORDER BY dup_key""".stripMargin)),

    // A15 — DLQ replay routing (replay-dlq-job.js:76-92): attempts >= max
    // → parking lot, else republish; either way the pass increments the
    // count (reconstructMessage, js:25 — parking stamps it as
    // x-final-attempt-count, replay as x-replay-attempts).
    EngineQuery("q36_dlq_replay_route",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), (col("event_id") % 5).as("attempts"))
        .withColumn("route",
          when(col("attempts") >= 3, lit("park")).otherwise(lit("replay")))
        .withColumn("new_attempts", col("attempts") + 1)
        .orderBy("event_id"),
      Some("""SELECT event_id, attempts,
             |  CASE WHEN attempts >= 3 THEN 'park' ELSE 'replay' END AS route,
             |  attempts + 1 AS new_attempts
             |FROM (SELECT event_id, event_id % 5 AS attempts FROM events) t
             |ORDER BY event_id""".stripMargin)),

    // A8/A9 — E.164 phone normalization over synthesized phone strings
    // (reference phone.js:15-29; formats from scripts/01_smoke_publish.js).
    EngineQuery("q37_phone_normalize",
      (s, dir) => {
        val c = Tables.table(s, dir, "customer")
        val a = lpad((lit(200) + col("c_custkey") % 700).cast("string"), 3, "0")
        val b = lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0")
        val d = lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0")
        val raw = when(col("c_custkey") % 4 === 0,
            concat(lit("("), a, lit(") "), b, lit("-"), d))
          .when(col("c_custkey") % 4 === 1, concat(a, lit("-"), b, lit("-"), d))
          .when(col("c_custkey") % 4 === 2, concat(lit("+1"), a, b, d))
          .otherwise(concat(lit("00"), a, b))
        c.select(col("c_custkey"), raw.as("raw_phone"),
            normalizePhone(raw).as("phone_e164"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, raw_phone,
             |  CASE WHEN raw_phone IS NULL THEN NULL
             |       WHEN starts_with(cleaned, '+') AND length(digits) BETWEEN 8 AND 15 THEN '+' || digits
             |       WHEN NOT starts_with(cleaned, '+') AND length(digits) = 10 THEN '+1' || digits
             |       WHEN NOT starts_with(cleaned, '+') AND length(digits) = 11 AND starts_with(digits, '1') THEN '+' || digits
             |       ELSE NULL END AS phone_e164
             |FROM (
             |  SELECT c_custkey, raw_phone,
             |    regexp_replace(raw_phone, '[^0-9+]', '', 'g') AS cleaned,
             |    regexp_replace(raw_phone, '[^0-9]', '', 'g') AS digits
             |  FROM (
             |    SELECT c_custkey,
             |      CASE WHEN c_custkey % 4 = 0 THEN '(' || a || ') ' || b || '-' || d
             |           WHEN c_custkey % 4 = 1 THEN a || '-' || b || '-' || d
             |           WHEN c_custkey % 4 = 2 THEN '+1' || a || b || d
             |           ELSE '00' || a || b END AS raw_phone
             |    FROM (
             |      SELECT c_custkey,
             |        lpad(CAST(200 + c_custkey % 700 AS VARCHAR), 3, '0') AS a,
             |        lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') AS b,
             |        lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') AS d
             |      FROM customer) t1) t2) t3
             |ORDER BY c_custkey""".stripMargin)),

    // B5 — filter on a JSON-extracted field + projection
    // (scripts/03_dlq_and_replay.js:71-75).
    EngineQuery("q45_json_filter",
      (s, dir) => Tables.events(s, dir)
        .filter(get_json_object(col("props"), "$.k") === "42")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("props"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type, props
             |FROM events
             |WHERE json_extract_string(props, '$.k') = '42'
             |ORDER BY event_id""".stripMargin)),

    // A17 — the same ratio through the registered UDAF (typed Aggregator
    // surface); oracle is the plain ratio arithmetic.
    EngineQuery("q59_udaf_sampling_rate",
      (s, dir) => {
        graft.operators.Metrics.register(s)
        Tables.events(s, dir)
          .select(col("event_type"), shouldSample(keyCol, 0.5).as("sampled"))
          .groupBy("event_type")
          .agg(expr("observed_sampling_rate(sampled)").as("observed_rate"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type,
              |  CAST(SUM(CASE WHEN CAST('0x' || substr(sha256($keySql), 1, 8) AS BIGINT) / 4294967295.0 < 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
              |    / CAST(COUNT(*) AS DOUBLE) AS observed_rate
              |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // A17/B7 — observed sampling-rate ratio (docs/monitoring.md:40-86):
    // kept / total per event_type, exact integer numerator + denominator.
    EngineQuery("q39_sampling_rate_ratio",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"), shouldSample(keyCol, 0.5).as("sampled"))
        .groupBy("event_type")
        .agg(sum(when(col("sampled"), 1L).otherwise(0L)).as("kept"),
          count(lit(1)).as("total"))
        .withColumn("observed_rate",
          col("kept").cast("double") / col("total").cast("double"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type, kept, total,
              |  CAST(kept AS DOUBLE) / CAST(total AS DOUBLE) AS observed_rate
              |FROM (
              |  SELECT event_type,
              |    CAST(SUM(CASE WHEN CAST('0x' || substr(sha256($keySql), 1, 8) AS BIGINT) / 4294967295.0 < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
              |    COUNT(*) AS total
              |  FROM events GROUP BY 1) t
              |ORDER BY event_type""".stripMargin)),

    // Q73 — funnel analysis: per user, the earliest view → first click at
    // or after it → first purchase at or after that. Staged conditional
    // mins, one user-keyed aggregation per stage (each a single shuffle on
    // user_id) with the stage frontier joined back — no window over the
    // full event history and no per-user event sorting, so a hot user
    // costs one aggregate row per stage, not a sort.
    EngineQuery("q73_funnel",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts") >= col("t_view"))
          .groupBy("user_id").agg(min(col("ts")).as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts") >= col("t_click"))
          .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"),
            col("t_purchase"),
            (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0) +
              when(col("t_purchase").isNotNull, 1).otherwise(0))
              .as("stages"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, MIN(ts) AS t_view FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
             |  JOIN v ON v.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
             |  JOIN c ON c.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
             |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
             |  1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
             |    + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS stages
             |FROM v LEFT JOIN c ON c.user_id = v.user_id
             |LEFT JOIN p ON p.user_id = v.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // EXT — SCD type-2 interval build: compress a per-user event stream
    // into validity intervals of the tracked attribute (event_type
    // here) — lag() detects changes, lead() closes each interval, the
    // open interval is current. The dimension-history build every
    // warehouse runs; one keyed window, no self-joins. Ordering inside
    // a user is (ts, event_id) so same-timestamp rows resolve
    // identically in both engines.
    EngineQuery("q96_scd2_intervals",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
          .withColumn("valid_to", lead(col("ts"), 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
          .select(col("user_id"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
          // valid_to tiebreak (nulls last, matching the oracle): a user
          // alternating types at one timestamp (A,B,A at the same ts)
          // yields rows identical on the first three keys but with
          // different valid_to — without it the two engines may order
          // those rows differently
          .orderBy(col("user_id"), col("valid_from"), col("event_type"),
            col("valid_to").asc_nulls_last)
      },
      Some("""WITH ch AS (
             |  SELECT user_id, ts, event_id, event_type FROM (
             |    SELECT user_id, ts, event_id, event_type,
             |      lag(event_type) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id) AS prev_type
             |    FROM events) x
             |  WHERE prev_type IS NULL OR prev_type <> event_type)
             |SELECT user_id, event_type, ts AS valid_from,
             |  lead(ts) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS valid_to,
             |  lead(ts) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) IS NULL AS is_current
             |FROM ch ORDER BY user_id, valid_from, event_type,
             |  valid_to NULLS LAST""".stripMargin)),

    // EXT — snapshot diff / migration reconciliation: classify every
    // key of two table snapshots as added / removed / changed /
    // unchanged (the check run after any copy, backfill, or engine
    // migration — the per-class dual of q74's scalar checksum). The
    // "new" snapshot is derived deterministically from events (drops,
    // value edits, inserts keyed off event_id) so both engines build
    // identical inputs; the diff itself is one full outer join on the
    // key comparing a content fingerprint, then a count per class.
    EngineQuery("q97_snapshot_diff",
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val edited = base.filter(col("event_id") % 101 =!= 0)
          .withColumn("value",
            when(col("event_id") % 103 === 0, col("value") + 1.0)
              .otherwise(col("value")))
        val inserts = base.filter(col("event_id") % 107 === 0)
          .select((col("event_id") + 10000000L).as("event_id"),
            col("event_type"), col("value"))
        val newSnap = edited.unionByName(inserts)
        // compare columns directly (exact doubles both sides); on a
        // wide table the scalable variant hashes a canonical row
        // fingerprint instead — but never a string-FORMATTED float,
        // whose rendering is engine-specific
        val o = base.toDF("event_id", "type_old", "value_old")
        val n = newSnap.toDF("event_id", "type_new", "value_new")
        o.join(n, Seq("event_id"), "full_outer")
          .select(
            when(col("type_old").isNull, lit("added"))
              .when(col("type_new").isNull, lit("removed"))
              .when(col("type_old") =!= col("type_new") ||
                col("value_old") =!= col("value_new"), lit("changed"))
              .otherwise(lit("unchanged")).as("change_type"))
          .groupBy("change_type").agg(count(lit(1)).as("n_rows"))
          .orderBy("change_type")
      },
      Some("""WITH base AS (
             |  SELECT event_id, event_type, value FROM events),
             |new_snap AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 103 = 0 THEN value + 1.0 ELSE value END AS value
             |  FROM base WHERE event_id % 101 <> 0
             |  UNION ALL
             |  SELECT event_id + 10000000, event_type, value
             |  FROM base WHERE event_id % 107 = 0)
             |SELECT CASE
             |    WHEN o.event_id IS NULL THEN 'added'
             |    WHEN n.event_id IS NULL THEN 'removed'
             |    WHEN o.event_type <> n.event_type OR o.value <> n.value
             |      THEN 'changed'
             |    ELSE 'unchanged' END AS change_type,
             |  COUNT(*) AS n_rows
             |FROM base o FULL OUTER JOIN new_snap n ON n.event_id = o.event_id
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — cohort retention: users grouped by first-activity week, the
    // count still active k weeks later (the classic retention triangle).
    // Two keyed aggregations — cohort assignment and distinct active
    // weeks — then a join on user_id and one count per (cohort, offset);
    // no windows, no per-user sorting, every stage partial-aggregates
    // map-side.
    EngineQuery("q94_cohort_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
        val cohort = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
          .select(col("user_id"),
            date_trunc("week", col("first_ts")).as("cohort_week"))
        val active = ev
          .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .distinct()
        active.join(cohort, Seq("user_id"))
          .select(col("cohort_week"),
            floor(datediff(col("week"), col("cohort_week")).cast("double") / 7.0)
              .cast("long").as("week_offset"))
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH cohort AS (
             |  SELECT user_id,
             |    CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
             |  FROM events GROUP BY 1),
             |active AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
             |  FROM events)
             |SELECT cohort_week,
             |  CAST(floor(datediff('day', CAST(cohort_week AS DATE),
             |    CAST(week AS DATE)) / 7.0) AS BIGINT) AS week_offset,
             |  COUNT(*) AS n_users
             |FROM active JOIN cohort USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Q74 — portable table checksum: TWO complementary order-independent
    // fingerprints of a 60-bit content hash per row, for verifying a
    // migration copied every row — the operation this engine's own
    // oracle gate performs, packaged as a query. Both fold map-side and
    // stay plain BIGINTs with identical binary representation in every
    // engine (a DECIMAL(38,0) sum was value-identical but hashed
    // differently per engine at the gate):
    //   - BIT_XOR: overflow-free, but blind to EVEN multiplicities (a
    //     double-write plus a matching double-drop cancels);
    //   - modular sum Σ(h mod p): multiplicity-sensitive, covering
    //     exactly the XOR blind spot (exact up to ~9e9 rows per group:
    //     each term < p ≈ 1e9).
    // A corruption must preserve both (and the row count) to slip by.
    EngineQuery("q74_table_checksum",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          sha256PrefixLong15(concat_ws("|", col("event_id"), col("user_id"),
            col("event_type"))).as("h"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("checksum_xor"),
          sum(col("h") % 1000000007L).as("checksum_mod"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n_rows,
             |  BIT_XOR(CAST('0x' || substr(sha256(
             |    CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
             |      || '|' || event_type), 1, 15) AS BIGINT)) AS checksum_xor,
             |  CAST(SUM(CAST('0x' || substr(sha256(
             |    CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
             |      || '|' || event_type), 1, 15) AS BIGINT) % 1000000007) AS BIGINT) AS checksum_mod
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // EXT — payload schema-drift profile: group events by the SORTED
    // key-set signature of their JSON payload (the reference's dynamic
    // `payload` role — SURVEY §1.2) and profile the known field's
    // type/range — the audit that catches a producer silently adding,
    // dropping, or retyping fields. Key introspection + one keyed
    // aggregation; extraction parity is string-path JSON on both
    // engines.
    EngineQuery("q188_payload_schema_profile",
      (s, dir) => Tables.events(s, dir)
        .select(
          array_join(array_sort(json_object_keys(col("props"))), ",")
            .as("key_sig"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy("key_sig")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("k_val").isNull, 1L).otherwise(0L))
            .as("n_null_k"),
          min(col("k_val")).as("min_k"),
          max(col("k_val")).as("max_k"))
        .orderBy("key_sig"),
      Some("""SELECT
             |  list_aggregate(list_sort(json_keys(props)), 'string_agg',
             |    ',') AS key_sig,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CASE WHEN json_extract_string(props, '$.k')
             |    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
             |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS min_k,
             |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS max_k
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
