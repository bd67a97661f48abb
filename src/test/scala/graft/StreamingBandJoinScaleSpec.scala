package graft

import java.nio.file.{Files, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BandJoin
import graft.streaming.StreamingBandJoin

/** Bench-scale streaming band join (the round-12 stream-stream leg of
  * the scale-evidence tier): every purchase × click pair within
  * ±30 min across the FULL sf0.1 events table — streamed as 20
  * event-time-ordered files, both sides branching from one file
  * source — must equal the batch [[BandJoin.band]] pair set EXACTLY.
  * Inner-join pairs emit as soon as both sides arrive, so unlike the
  * windowed aggregates there is no watermark tail: the gate is full
  * set equality, proving the bucket-sharded symmetric-hash state
  * retains and matches every cross-micro-batch pair at corpus scale.
  */
class StreamingBandJoinScaleSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  private lazy val chunkDir: String = {
    val root = Files.createTempDirectory("graft-band-chunks")
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"))
      .orderBy("ts")
      .withColumn("chunk", expr(
        "cast((row_number() over (order by ts) - 1) div 5000 as int)"))
    (0 until 20).foreach { i =>
      val tmp = root.resolve(s"tmp_$i")
      ev.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, root.resolve(f"c$i%02d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    root.toString
  }

  private def purchases(df: DataFrame) =
    df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"),
        col("ts").cast("timestamp").as("p_ts"))

  private def clicks(df: DataFrame) =
    df.filter(col("event_type") === "click")
      .select(col("event_id").as("c_event_id"),
        col("ts").cast("timestamp").as("c_ts"))

  test("sf0.1 purchase-click pairs streamed over 20 files equal the batch band join") {
    val schema = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type")).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(chunkDir)
    val joined = StreamingBandJoin.band(
      purchases(stream), clicks(stream), "p_ts", "c_ts",
      radiusSeconds = 1800L)
    val q = joined.select("p_event_id", "c_event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("band_scale")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-band-scale").toString)
      .start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    val streamed = spark.table("band_scale").as[(Long, Long)].collect().toSet

    val ev = Tables.events(spark, dir)
    val batch = BandJoin.band(
        purchases(ev).select(col("p_event_id"),
          unix_micros(col("p_ts")).as("p_us")),
        clicks(ev).select(col("c_event_id"),
          unix_micros(col("c_ts")).as("c_us")),
        "p_us", "c_us", 1800000000L)
      .select("p_event_id", "c_event_id")
      .as[(Long, Long)].collect().toSet

    assert(batch.size > 100000, s"fixture too small: ${batch.size} pairs")
    assert(streamed === batch,
      s"stream/batch drift: ${(streamed diff batch).size} extra, " +
        s"${(batch diff streamed).size} missing of ${batch.size}")
    println(f"[stream-band] ${batch.size}%d pairs across 20 micro-batches " +
      f"in $secs%.1f s — exact set equality")
  }
}
