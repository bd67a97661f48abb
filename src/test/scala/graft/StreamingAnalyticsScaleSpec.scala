package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAnalytics

/** Bench-scale streaming windowed analytics (the round-12 Q22/Q23 leg
  * of the scale-evidence tier): the FULL sf0.1 events table, split
  * into 20 event-time-ordered parquet files and streamed one file per
  * trigger, must finalize tumbling (q22) and sliding (q23) windows
  * that are EXACTLY their oracle-gated batch twins — count and
  * decimal-exact sum per (window, event_type), no tolerance. The feed
  * is time-ordered, so the 1-hour watermark drops nothing; only the
  * watermark-tail windows may be unfinalized, and the spec pins that
  * the missing set is exactly that tail, with ≥90% of all windows
  * finalized. Proves the built-in window()/session_window state
  * machinery emits batch-identical aggregates across 20 real
  * micro-batches at corpus scale.
  */
class StreamingAnalyticsScaleSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  /** 20 time-ordered single-file chunks under one stream-source dir;
    * lexicographic names + ascending mod times fix the pickup order. */
  private lazy val chunkDir: String = {
    val root = Files.createTempDirectory("graft-ev-chunks")
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value"))
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
      // scrub the helper dir so the source sees exactly 20 files
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    root.toString
  }

  private def runStream(agg: DataFrame => DataFrame, name: String): Unit = {
    val schema = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value")).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(chunkDir)
      // watermarks require TIMESTAMP (LTZ); identity under the UTC
      // session tz, and the monitors cast back to NTZ on output
      .withColumn("ts", col("ts").cast("timestamp"))
    val q = agg(stream).writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  private def compare(streamTable: String, batchQuery: String,
      tailHours: Long): Unit = {
    val cols = spark.table(streamTable).columns
    def keyed(df: DataFrame): Set[(java.time.LocalDateTime, String)] =
      df.selectExpr(cols.map(c => s"cast($c as string)"): _*)
        .collect()
        .map(r => (java.time.LocalDateTime.parse(
            r.getString(0).replace(' ', 'T')),
          (1 until r.length).map(r.getString).mkString("|"))).toSet
    val streamed = keyed(spark.table(streamTable))
    val batch = keyed(SparkEntry.queries(batchQuery)(spark, dir))
    assert(streamed.nonEmpty, "watermark finalized no windows")
    assert(streamed.subsetOf(batch),
      s"$streamTable: a finalized streaming window diverges from $batchQuery")
    val missing = batch -- streamed
    val maxFinalized = streamed.map(_._1).max
    assert(missing.forall(_._1.isAfter(maxFinalized.minusHours(tailHours))),
      s"$streamTable: non-tail windows missing (${missing.size})")
    val coverage = streamed.size.toDouble / batch.size
    assert(coverage >= 0.90,
      f"$streamTable: only ${coverage * 100}%.1f%% of windows finalized")
    println(f"[stream-windows] $streamTable: ${streamed.size}%d of " +
      f"${batch.size}%d windows finalized exactly (${coverage * 100}%.1f%%)")
  }

  test("sf0.1 tumbling windows streamed over 20 files equal q22 exactly") {
    runStream(StreamingAnalytics.tumblingCounts(_, watermark = "1 hour"),
      "tumbling_scale")
    compare("tumbling_scale", "q22_tumbling_window", tailHours = 2)
  }

  test("sf0.1 sliding windows streamed over 20 files equal q23 exactly") {
    runStream(StreamingAnalytics.slidingCounts(_, watermark = "1 hour"),
      "sliding_scale")
    compare("sliding_scale", "q23_sliding_window", tailHours = 2)
  }
}
