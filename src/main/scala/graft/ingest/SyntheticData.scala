package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CoreFunctions.sha256PrefixLong15

/** A18 — distributed synthetic envelope generator (reference
  * load-test.js:22-55 / scripts/04_step_load_test.js:28-62): seeded,
  * columnar (spark.range — no driver-side loops), emitting base64-encoded
  * Pub/Sub-style push bodies the ingest pipeline consumes.
  *
  * Deterministic for a given (n, seed): randomness comes from a SHA-256
  * of the row index — NOT from rand() (re-runs and retries produce
  * identical data on any partitioning) and NOT from an engine-private
  * hash (the same derivation is expressible in plain SQL, so the DuckDB
  * oracle can regenerate the identical corpus and hash-check the whole
  * ingest pipeline end to end: q41–q43).
  */
object SyntheticData {

  private def pick(idx: org.apache.spark.sql.Column, values: Seq[String]) =
    element_at(array(values.map(lit): _*), (pmod(idx, lit(values.size)) + 1).cast("int"))

  /** n synthetic envelopes as (message_id, ordering_key, data) push
    * bodies. A slice of them is deliberately malformed (missing tenant_id
    * / broken JSON) to exercise the DLQ routes, mirroring
    * scripts/03_dlq_and_replay.js:15-30. ordering_key is a transport
    * attribute (the Pub/Sub message orderingKey) — it rides outside the
    * payload, so it survives even on corrupted rows. */
  def envelopes(spark: SparkSession, n: Long, seed: Long = 42L,
      invalidEveryNth: Int = 50): DataFrame = {
    // 60-bit non-negative hash both engines can compute:
    //   CAST('0x' || substr(sha256('syn:' || i || ':' || seed), 1, 15) AS BIGINT)
    val base = spark.range(n).select(col("id"),
      sha256PrefixLong15(concat(lit("syn:"), col("id").cast("string"),
        lit(s":$seed"))).as("h"))
    val h = col("h")
    val tenant = pick(h, Seq("tenant-a", "tenant-b", "tenant-c"))
    // integer div (not /: true division would go through double and lose
    // exactness above 2^53)
    val eventType = pick(expr("h div 7"), Seq("call.completed", "chat.message"))
    val phone = concat(lit("+1415555"), lpad(pmod(h, lit(10000)).cast("string"), 4, "0"))
    val phone2 = concat(lit("(415) 555-"), lpad(pmod(expr("h div 3"), lit(10000)).cast("string"), 4, "0"))
    val occurred = date_format(
      timestamp_seconds(lit(1704067200L) + pmod(h, lit(86400L * 30))),
      "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val payload = concat(lit("{\"call_id\":\"call-"), col("id").cast("string"),
      lit("\",\"caller\":\""), phone,
      lit("\",\"callee\":\""), phone2,
      lit("\",\"duration\":"), pmod(h, lit(3600)).cast("string"),
      lit(",\"status\":\""), pick(expr("h div 11"), Seq("completed", "failed", "missed")),
      lit("\",\"metadata\":{\"test\":\"true\",\"sequence\":\""),
      col("id").cast("string"), lit("\"}}"))
    val envelope = concat(
      lit("{\"envelope_version\":\"1\",\"event_type\":\""), eventType,
      lit("\",\"schema_version\":\"2\",\"tenant_id\":\""), tenant,
      lit("\",\"occurred_at\":\""), occurred,
      lit("\",\"trace_id\":\"trace-"), col("id").cast("string"),
      lit("\",\"source\":\"load-test\",\"payload\":"), payload, lit("}"))
    // every Nth row: drop tenant_id (terminal missing_fields); every
    // (2N)th: corrupt the JSON outright (invalid_json)
    val corrupted = when(pmod(col("id"), lit(invalidEveryNth * 2)) === 0,
        lit("not-json-at-all"))
      .when(pmod(col("id"), lit(invalidEveryNth)) === 0,
        regexp_replace(envelope, "\"tenant_id\":\"[^\"]*\",", ""))
      .otherwise(envelope)
    base.select(
      concat(lit("msg-"), col("id").cast("string")).as("message_id"),
      tenant.as("ordering_key"),
      base64(corrupted.cast("binary")).as("data"))
  }
}
