package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BandJoin
import graft.streaming.{StreamingAnalytics, StreamingBandJoin}

/** StreamingBandJoin must reproduce the batch BandJoin EXACTLY: inner
  * pairs emit once both sides arrive and can never be revised, so on a
  * bounded input the streamed pair set equals the batch pair set — no
  * tail tolerance needed (unlike windowed aggs). Also pins the scale
  * contract: the physical plan must carry the bucket equality as a
  * real join key (state shards by bucket, not one global partition). */
class StreamingBandJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def purchases(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"),
        col("ts").cast("timestamp").as("p_ts"))

  private def clicks(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"),
        col("ts").cast("timestamp").as("c_ts"))

  test("streamed band pairs equal the batch operator's pairs (±30 min)") {
    val stream = StreamingAnalytics.eventsStream(spark, dir,
      maxFilesPerTrigger = 1)
    val joined = StreamingBandJoin.band(
      purchases(stream), clicks(stream), "p_ts", "c_ts",
      radiusSeconds = 1800L)
    val q = joined.select("p_event_id", "c_event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("band_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sbj").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("band_out")
      .as[(Long, Long)].collect().toSet

    val ev = Tables.events(spark, dir)
    val batch = BandJoin.band(
        purchases(ev).select(col("p_event_id"),
          unix_micros(col("p_ts")).as("p_us")),
        clicks(ev).select(col("c_event_id"),
          unix_micros(col("c_ts")).as("c_us")),
        "p_us", "c_us", 1800000000L)
      .select("p_event_id", "c_event_id")
      .as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture produced no band pairs")
    assert(streamed == batch,
      s"stream/batch drift: ${(streamed diff batch).size} extra, " +
        s"${(batch diff streamed).size} missing of ${batch.size}")
  }

  test("the join keys on the bucket id — state shards, no single-partition join") {
    val stream = StreamingAnalytics.eventsStream(spark, dir)
    val joined = StreamingBandJoin.band(
      purchases(stream), clicks(stream), "p_ts", "c_ts", 1800L)
    val plan = joined.queryExecution.analyzed.toString
    assert(plan.contains("__band_bucket_l") &&
      plan.contains("__band_bucket_r"),
      s"bucket keys missing from the join:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"),
      "band join must never plan a cartesian")
  }
}
