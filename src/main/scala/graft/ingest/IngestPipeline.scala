package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.CoreFunctions._

/** The reference's ingest pipeline (SURVEY §2A A2–A14) as one declarative
  * Spark transform chain: decode → validate → key-derive → sample →
  * phone-normalize → project → split(events, dlq).
  *
  * The whole chain is column expressions over a single scan — Catalyst
  * fuses it into one whole-stage-codegen'd stage (SURVEY §3.1), so the
  * same code serves batch DataFrames and Structured Streaming inputs.
  * Reference behavior mirrored from handler.js:37-109, validation.js,
  * sampling.js, phone.js, bq.js:20-35.
  */
object IngestPipeline {

  /** Pipeline configuration (reference env vars, README.md:160-168).
    * defaultRegion mirrors DEFAULT_PHONE_REGION (phone.js:7). */
  final case class Config(
      auditRate: Double = 1.0,
      defaultRegion: String = CoreFunctionsDefaultRegion,
      /** Fixed ingest timestamp for deterministic tests; None = now(). */
      receivedAt: Option[java.sql.Timestamp] = None)

  private def CoreFunctionsDefaultRegion =
    graft.functions.CoreFunctions.defaultPhoneRegion

  /** Typed view of the known payload fields (load-test.js:35-47,
    * scripts/01_smoke_publish.js:71-77); unknown fields survive inside
    * the raw JSON string column. */
  val payloadSchema: StructType = StructType(Seq(
    StructField("call_id", StringType),
    StructField("message_id", StringType),
    StructField("caller", StringType),
    StructField("callee", StringType),
    StructField("from_phone", StringType),
    StructField("to_phone", StringType),
    StructField("duration", DoubleType),
    StructField("status", StringType),
    StructField("channel", StringType),
    StructField("text_length", LongType),
    StructField("metadata", MapType(StringType, StringType))))

  /** A2 — base64-decode a Pub/Sub push body column and surface the
    * envelope fields (handler.js:43-44). Bad base64 / non-JSON rows get
    * null envelope fields and are routed by [[validated]]. */
  def decoded(raw: DataFrame, dataCol: String = "data"): DataFrame = {
    val json = col("__raw_json")
    // try_to_binary: malformed base64 yields null (→ invalid_json route)
    // instead of an ANSI execution error.
    // noInline: downstream validation filters reference the decoded JSON
    // ~12×; without the barrier, predicate pushdown re-embeds the whole
    // decode-of-source tree per reference — recomputed per row AND (with
    // an expression-defined source like the synthetic generator) a fused
    // stage past the JVM's 64 KB codegen limit. Decode once, reference
    // many. The barrier also stops predicates on SIBLING columns from
    // crossing this projection (Catalyst tests all fields of a Project),
    // so apply source-column filters — partition pruning, attribute
    // predicates — to `raw` BEFORE calling decoded().
    raw.withColumn("__raw_json",
        noInline(expr(s"cast(try_to_binary($dataCol, 'base64') as string)")))
      .withColumn("envelope_version", get_json_object(json, "$.envelope_version"))
      .withColumn("event_type", get_json_object(json, "$.event_type"))
      .withColumn("schema_version", get_json_object(json, "$.schema_version"))
      .withColumn("tenant_id", get_json_object(json, "$.tenant_id"))
      .withColumn("occurred_at", get_json_object(json, "$.occurred_at"))
      .withColumn("trace_id", get_json_object(json, "$.trace_id"))
      .withColumn("source", get_json_object(json, "$.source"))
      .withColumn("payload", get_json_object(json, "$.payload"))
  }

  /** A3+A4+A5 — envelope validation + key derivation (validation.js:12-66):
    * adds is_valid, error_type, idempotency_key. */
  def validated(df: DataFrame): DataFrame = {
    val requiredOk = Seq("envelope_version", "event_type", "schema_version",
      "tenant_id", "occurred_at", "payload").map(col(_).isNotNull)
      .reduce(_ && _)
    // try_ variant: malformed timestamps must route to the DLQ, not throw
    // (ANSI mode is on)
    val tsOk = expr("try_to_timestamp(occurred_at)").isNotNull
    val key = idempotencyKey(col("payload"),
      Seq("$.call_id", "$.message_id"), col("trace_id"))
    df.withColumn("idempotency_key", key)
      .withColumn("error_type",
        when(col("__raw_json").isNull ||
            get_json_object(col("__raw_json"), "$.event_type").isNull &&
            !col("__raw_json").rlike("^\\s*\\{"), lit("invalid_json"))
          .when(!requiredOk, lit("missing_fields"))
          .when(!tsOk, lit("invalid_timestamp"))
          .when(key.isNull, lit("no_idempotency_key"))
          .otherwise(lit(null).cast("string")))
      .withColumn("is_valid", col("error_type").isNull)
  }

  /** A6+A7 — deterministic sampling decision column (sampling.js). */
  def sampled(df: DataFrame, cfg: Config): DataFrame =
    df.withColumn("sampled",
      shouldSample(col("idempotency_key"), cfg.auditRate))

  /** A9 — normalize the four phone fields inside the payload JSON
    * (phone.js:36-56) via a typed struct round-trip; untouched fields and
    * nested metadata survive. */
  def phoneNormalized(df: DataFrame,
      region: String = graft.functions.CoreFunctions.defaultPhoneRegion)
      : DataFrame = {
    // parse once, rebuild the struct flat: a withField fold over from_json
    // re-embeds the parse (and the regex-heavy normalizer) per field and
    // blows up the codegen'd expression tree
    val parsed = df.withColumn("payload_struct",
      from_json(col("payload"), payloadSchema))
    val p = col("payload_struct")
    val phoneFields = Set("caller", "callee", "from_phone", "to_phone")
    val rebuilt = struct(payloadSchema.fields.toIndexedSeq.map { f =>
      val v = p.getField(f.name)
      (if (phoneFields(f.name)) normalizePhone(v, region) else v).as(f.name)
    }: _*)
    parsed.withColumn("payload_normalized", to_json(rebuilt))
  }

  /** A10 — warehouse-row projection (bq.js:20-35): INT casts, defaults,
    * ingest timestamp, sampled flag, normalized payload re-serialized. */
  def projected(df: DataFrame, cfg: Config): DataFrame = {
    val receivedAt = cfg.receivedAt
      .map(ts => lit(ts).cast("timestamp"))
      .getOrElse(current_timestamp())
    df.select(
      col("tenant_id"),
      col("event_type"),
      col("schema_version").cast("long").as("schema_version"),
      col("envelope_version").cast("long").as("envelope_version"),
      col("trace_id"),
      expr("try_to_timestamp(occurred_at)").as("occurred_at"),
      receivedAt.as("received_at"),
      coalesce(col("source"), lit("unknown")).as("source"),
      lit(true).as("sampled"),
      col("idempotency_key"),
      col("payload_normalized").as("payload"))
  }

  /** Result of a pipeline run: warehouse-ready rows, DLQ rows with error
    * routing, and rows dropped by sampling (observability only). */
  final case class IngestResult(events: DataFrame, dlq: DataFrame,
      sampledOut: DataFrame)

  /** Shared front half of the pipeline: decode → validate → sample. All
    * three outputs ([[split]]) derive from this one frame — callers that
    * need more than one output should persist it so the fused
    * decode/validate expression tree is compiled and executed once. */
  def prepare(raw: DataFrame, cfg: Config = Config()): DataFrame =
    sampled(validated(decoded(raw)), cfg)

  /** Back half: route a prepared frame into (events, dlq, sampled-out).
    * A12's dedup: events are dropDuplicates on idempotency_key — stronger
    * than the reference's best-effort BigQuery insertId (SURVEY A12).
    * IngestPipelineSpec asserts the whole path stays inside whole-stage
    * codegen with spark.sql.codegen.fallback=false. */
  def split(v: DataFrame, cfg: Config = Config()): IngestResult = {
    val valid = v.filter(col("is_valid"))
    // The explicit repartition IS the dedup's shuffle (hashpartitioning on
    // the key satisfies the aggregate's distribution — EnsureRequirements
    // adds no second exchange). Placing it between the heavy
    // decode→normalize→project tree and the dedup aggregate cuts the
    // codegen stage there: the map side carries the column work (a plain
    // projection, which codegens fine), the reduce side aggregates 11
    // already-materialized attributes. Fused into one stage, the
    // aggregate's generated doAggregateWithKeys() re-embeds every
    // upstream column tree per first() expr and exceeds the JVM's 64 KB
    // method limit — a silent fall-back off whole-stage codegen for the
    // hot ingest stage.
    val events = projected(
        phoneNormalized(valid.filter(col("sampled")), cfg.defaultRegion), cfg)
      .repartition(col("idempotency_key"))
      .dropDuplicates("idempotency_key")
    // A13/A14 — terminal errors route to the DLQ with an HTTP-status
    // taxonomy (handler.js:16-32); transient (5xx) rows stay re-playable.
    // Transport attributes (message_id, ordering_key) ride along when the
    // source carries them, so replay can reconstruct the message
    // (replay-dlq-job.js:36-51).
    val transport = Seq("message_id", "ordering_key").filter(v.columns.contains)
    // the replay counter is a transport attribute (x-replay-attempts,
    // replay-dlq-job.js:25): a re-ingested replay carries its incremented
    // count, so a row that keeps failing accumulates attempts across
    // DLQ→replay→DLQ cycles until DlqReplay.route parks it
    val attemptsIn =
      if (v.columns.contains("replay_attempts")) col("replay_attempts")
      else lit(0)
    val dlq = v.filter(!col("is_valid"))
      .withColumn("http_status", categorizeError(col("error_type")))
      .withColumn("replay_attempts", attemptsIn)
      .select(("data" +: transport ++: Seq("error_type", "http_status",
        "replay_attempts")).map(col): _*)
    val sampledOut = v.filter(col("is_valid") && !col("sampled"))
      .select("idempotency_key", "tenant_id", "event_type")
    IngestResult(events, dlq, sampledOut)
  }

  /** Full pipeline: raw push bodies → (events, dlq, sampled-out). */
  def run(raw: DataFrame, cfg: Config = Config()): IngestResult =
    split(prepare(raw, cfg), cfg)
}
