package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAnalytics

/** The streaming windowed aggregations must agree with their oracle-
  * checked batch twins: every window the stream finalizes (watermark
  * passed) carries exactly the batch result. */
class StreamingAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling windows agree with the batch twin q22 (A1/A11/Q22)") {
    val stream = StreamingAnalytics.eventsStream(spark, dir)
    val agg = StreamingAnalytics.tumblingCounts(stream, watermark = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumbling_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-q22").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .as[(java.time.LocalDateTime, String, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("q22_tumbling_window")(spark, dir)
      .as[(java.time.LocalDateTime, String, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "watermark finalized no windows")
    assert(streamed.subsetOf(batch),
      "every finalized streaming window must equal its batch twin")
    // only the tail windows still inside the watermark may be missing
    val missing = batch -- streamed
    val maxFinalized = streamed.map(_._1).max
    assert(missing.forall(_._1.isAfter(maxFinalized.minusHours(2))),
      s"non-tail windows missing from the stream: $missing")
  }

  test("watermark drops late data (Q23 semantics)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAnalytics
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingAnalytics.tumblingCounts(events, watermark = "30 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-late").toString)
      .start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2024-01-01 10:15:00"), "a", 1.0))
    q.processAllAvailable()
    // advance the watermark far past the 10:00 window
    input.addData((ts("2024-01-01 14:00:00"), "a", 1.0))
    q.processAllAvailable()
    // late arrival for the already-finalized 10:00 window → dropped
    input.addData((ts("2024-01-01 10:20:00"), "a", 99.0))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 18:00:00"), "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val tenOClock = spark.table("late_out")
      .filter(col("hour_start") === lit("2024-01-01 10:00:00").cast("timestamp_ntz"))
      .collect()
    assert(tenOClock.length === 1)
    assert(tenOClock.head.getAs[Long]("n") === 1L,
      "the late event must not re-open the finalized window")
  }

  test("stream-stream interval join attributes purchases to in-window clicks (Q65 twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val joined = StreamingAnalytics.clickAttribution(events,
      watermark = "30 minutes", joinWindow = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-attrib").toString)
      .start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "purchase", 9.5), // in window
      (3L, ts("2024-01-01 11:30:00"), 7L, "purchase", 1.0), // outside window
      (4L, ts("2024-01-01 10:10:00"), 8L, "purchase", 2.0)) // other user
    q.processAllAvailable()
    // push the watermark past everything so the join state finalizes
    input.addData((9L, ts("2024-01-01 15:00:00"), 9L, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attrib_out")
      .select("purchase_id", "click_id", "user_id", "purchase_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out === Set((2L, 1L, 7L, 9.5)),
      "exactly the in-window same-user purchase must attribute")
  }

  test("stream-static enrichment joins each batch against the broadcast dimension") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "trial")).toDF("user_id", "segment")
    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("event_id", "user_id", "value")
    val q = StreamingAnalytics.enriched(events, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-enrich").toString)
      .start()
    input.addData((1L, 7L, 1.0), (2L, 9L, 2.0))
    q.processAllAvailable()
    input.addData((3L, 8L, 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enriched_out")
      .select("event_id", "segment")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // left join: unknown user survives with a null segment, across batches
    assert(out === Map(1L -> Some("gold"), 2L -> None, 3L -> Some("trial")))
  }

  test("streaming session windows agree with the batch twin q24 on finalized sessions") {
    val stream = StreamingAnalytics.eventsStream(spark, dir)
    val agg = StreamingAnalytics.sessionCounts(stream, watermark = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sessions_stream_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-q24").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_stream_out")
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet
    val batch = SparkEntry.queries("q24_sessionization")(spark, dir)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      "every finalized streaming session must equal its batch twin")
  }

  test("streaming heavy hitters honour the Misra-Gries guarantee per window") {
    val k = 16
    val stream = StreamingAnalytics.eventsStream(spark, dir)
    val agg = StreamingAnalytics.trendingKeys(stream, k = k,
      watermark = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("trending_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hh").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val sketched = spark.table("trending_out")
      .as[(java.time.LocalDateTime, Long, String, Long)].collect()
      .groupBy(_._1)
      .map { case (w, rows) => w -> rows.map(r => r._3 -> r._4).toMap }
    assert(sketched.nonEmpty, "watermark finalized no windows")
    // exact per-window user counts from the batch table
    val exact = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").cast("timestamp_ntz"),
        col("user_id").cast("string"), col("c"))
      .as[(java.time.LocalDateTime, String, Long)].collect()
      .groupBy(_._1)
      .map { case (w, rows) => w -> rows.map(r => r._2 -> r._3).toMap }
    sketched.foreach { case (w, hits) =>
      val truth = exact(w)
      val n = truth.values.sum
      val bound = n.toDouble / (k + 1)
      assert(hits.size <= k, s"window $w emitted ${hits.size} > k rows")
      hits.foreach { case (item, est) =>
        val t = truth.getOrElse(item, 0L)
        assert(est <= t && est >= t - bound,
          s"window $w item $item: estimate $est outside [${t - bound}, $t]")
      }
      truth.filter(_._2 > bound).keys.foreach(u =>
        assert(hits.contains(u),
          s"window $w: guaranteed heavy hitter $u missing from the sketch"))
    }
  }

  test("streaming OHLC bars agree with the batch twin q106 on finalized bars") {
    val stream = StreamingAnalytics.eventsStream(spark, dir)
    val agg = StreamingAnalytics.ohlcBars(stream, watermark = "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("ohlc_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ohlc").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ohlc_out")
      .as[(String, java.time.LocalDateTime, Double, Double, Double,
        Double, Long, Double)].collect().toSet
    val batch = SparkEntry.queries("q106_ohlc_resample")(spark, dir)
      .as[(String, java.time.LocalDateTime, Double, Double, Double,
        Double, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "watermark finalized no bars")
    // bit-exact bar agreement: open/close selections, extremes, decimal
    // volume — the same cells the DuckDB gate hashes on the batch side
    assert(streamed.subsetOf(batch),
      "every finalized streaming bar must equal its batch twin")
    val missing = batch -- streamed
    val maxFinalized = streamed.map(_._2).max
    assert(missing.forall(_._2.isAfter(maxFinalized.minusHours(2))),
      s"non-tail bars missing from the stream: $missing")
  }
}
