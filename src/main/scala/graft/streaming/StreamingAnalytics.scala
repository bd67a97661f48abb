package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming forms of the windowed analytics queries (Q22–Q24): the same
  * window()/session_window() operators the batch twins use, behind a
  * watermark, fed from a file stream.
  *
  * The batch formulations in graft.queries.WindowQueries are the oracle-
  * checked twins; these run the identical aggregation incrementally with
  * bounded state (watermark expires windows, maxFilesPerTrigger bounds
  * per-batch input — the reference's MAX_BATCH_SIZE analog).
  */
object StreamingAnalytics {

  /** Attribution lookback shared by [[clickAttribution]]'s default and the
    * q65 oracle SQL — interpolated into both so changing it cannot desync
    * engine and oracle. */
  val DefaultJoinWindowMinutes = 30

  /** Stream-static enrichment join: each micro-batch left-joins the
    * (small) static dimension, broadcast so the stream side never
    * shuffles. State-free — no watermark needed — and a file-backed
    * dimension is re-scanned per batch, so dimension updates flow into
    * later batches. The scale contract mirrors the relational layer: only
    * true fixed-cardinality dimensions belong here; a growing dim belongs
    * in a stream-stream join with watermarks ([[clickAttribution]]). */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream the events table: ns-timestamp read as long (the same fix
    * Tables.events applies) surfaced as a microsecond timestamp_ntz. */
  def eventsStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file's physical ts encoding varies by testdata generation
    // (TIMESTAMP(NANOS) read as raw long vs TIMESTAMP(MICROS)); a stream
    // needs a declared schema, so sniff the footer via the batch reader
    // and declare the matching type (Tables.events documents the split).
    val tsIsLong = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val schema = StructType.fromDDL(
      s"event_id BIGINT, ts ${if (tsIsLong) "BIGINT" else "TIMESTAMP_NTZ"}, " +
        "user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // watermarks require TIMESTAMP (with local tz); under the UTC
    // session the wall-clock values match the batch twin's ntz ones,
    // and window bounds are cast to ntz at output
    if (tsIsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Q22 streaming form: tumbling 1-hour counts/sums per event type. */
  def tumblingCounts(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Q23 streaming form: sliding 30-minute windows, 15-minute slide. */
  def slidingCounts(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"))

  /** Q24 streaming form: native session windows per user. */
  def sessionCounts(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("n_events"))

  /** Streaming heavy hitters: per-tumbling-window Misra–Gries top-k
    * sketch over a key column (trending/hot keys on a stream — the
    * skew-detection and trending-items use the batch
    * [[graft.operators.HeavyHitters]] documents, run incrementally).
    * The sketch is a mergeable typed Aggregator, so the streaming
    * engine folds each micro-batch map-side into O(k) state per open
    * window and MERGES partials across batches — state is
    * |open windows|·k counters, never |distinct keys|: the property
    * that makes per-window top-k viable when the key space (users,
    * URLs, tokens) is unbounded. Append mode + watermark emit each
    * window once, finalized.
    *
    * Output: (hour_start, rank, item, min_count) — min_count is the MG
    * lower bound; every key with true frequency > n/(k+1) in its
    * window is guaranteed present (see the operator's scaladoc). */
  def trendingKeys(events: DataFrame, keyCol: String = "user_id",
      k: Int = 16, watermark: String = "2 hours"): DataFrame = {
    val hh = udaf(graft.operators.HeavyHitters.sketch(k),
      org.apache.spark.sql.Encoders.STRING)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hh(col(keyCol).cast("string")).as("hits"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        posexplode(col("hits")))
      .select(col("hour_start"), (col("pos") + 1).cast("long").as("rank"),
        col("col.item").as("item"), col("col.min_count").as("min_count"))
  }

  /** q106's streaming form — per-(type, hour) OHLC bars computed
    * incrementally: open/close are (ts, event_id)-ordered min_by/max_by
    * SELECTIONS (exact doubles, no cross-row float arithmetic — the
    * batch twin's discipline), volume the exact decimal sum. min_by /
    * max_by carry their ordering key through partial-merge state, so
    * per-batch folds and cross-batch merges land on the same bar a
    * single batch pass would produce; append mode + watermark emit each
    * bar once, finalized. State is one (value, key) pair per extreme
    * per open bar — O(|types|·|open hours|), independent of row rate. */
  def ohlcBars(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("volume"))
      .select(col("event_type"),
        col("window.start").cast("timestamp_ntz").as("hour"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("volume"))

  /** Stream-stream interval join: attribute each 'purchase' to the same
    * user's 'click's in the preceding `joinWindow`. Both sides carry
    * watermarks AND the join condition bounds the event-time gap, so
    * Spark derives a state eviction horizon for each side — join state is
    * bounded, the requirement for any stream-stream join at 100 TB/day.
    * Works identically on a batch frame (the q65 oracle twin runs exactly
    * this shape as SQL). */
  def clickAttribution(events: DataFrame, watermark: String = "1 hour",
      joinWindow: String = s"$DefaultJoinWindowMinutes minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $joinWindow"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }
}
