package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDecayedRate
import graft.streaming.StreamingDecayedRate.{RateEvent, RateReading}

/** Bench-scale streaming decayed-rate (the round-12 arrival-intensity
  * leg of the scale-evidence tier): the FULL sf0.1 events table
  * streamed through [[StreamingDecayedRate.monitor]] keyed by
  * event_type must end with the decayed counter matching the same
  * decay-then-increment recurrence evaluated by Spark SQL's
  * `aggregate` fold over the (tsMs, id)-sorted arrival sequence.
  * `pow` is the one primitive that is NOT bit-stable across code
  * paths (the JIT intrinsic and codegen'd java.lang.Math.pow may
  * differ by an ulp per call — measured 2 ulps over 20k folds), so
  * the counter gate is relative 1e-12 — a lost or double-counted
  * arrival moves the counter by ~1, twelve orders above the gate —
  * while n stays integer-exact. The event-time-timeout path
  * (dead-feed readings) is pinned separately at unit scale; here the
  * silence window is set beyond the table's span so only arrival
  * readings fire.
  */
class StreamingDecayedRateScaleSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val HalfLifeMs = 3600000.0 // 1h: event-time gaps decay visibly

  /** Batch twin: the identical recurrence as a Catalyst `aggregate`
    * fold over the sorted per-key (tsMs, id) sequence. */
  private def batchFold(): Map[String, (Long, Double)] = {
    spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select(col("event_type").cast("string").as("k"),
        (unix_timestamp(col("ts").cast("timestamp")) * 1000L).as("tsMs"),
        col("event_id"))
      .groupBy("k")
      .agg(expr(
        s"""aggregate(
           |  transform(
           |    array_sort(collect_list(struct(tsMs, event_id))),
           |    e -> e.tsMs),
           |  struct(cast(0 as bigint) as lastMs, cast(0 as double) as cnt,
           |         cast(0 as bigint) as n),
           |  (acc, t) -> struct(
           |    greatest(acc.lastMs, t) as lastMs,
           |    if(acc.n = 0, cast(1 as double),
           |      acc.cnt * power(0.5d,
           |        cast(greatest(0L, t - acc.lastMs) as double)
           |          / ${HalfLifeMs}d) + 1.0d) as cnt,
           |    acc.n + 1L as n))""".stripMargin).as("st"))
      .select(col("k"), col("st.n"), col("st.cnt"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("sf0.1 events streamed in micro-batches end bit-exact vs the SQL aggregate fold") {
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select(col("event_id"),
        (unix_timestamp(col("ts").cast("timestamp")) * 1000L).as("tsMs"),
        col("event_type").cast("string").as("k"))
      .as[(Long, Long, String)].collect()
      .sortBy(e => (e._2, e._1))
      .map { case (id, tsMs, k) => RateEvent(id, tsMs, k) }
    val want = batchFold()

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateEvent]
    val q = StreamingDecayedRate.monitor(input.toDS(),
        halfLifeMs = HalfLifeMs,
        silenceMs = 400L * 24 * 3600 * 1000)
      .writeStream.outputMode("append")
      .format("memory").queryName("decay_scale")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-decay-scale").toString)
      .start()
    val t0 = System.nanoTime()
    ev.grouped(5000).foreach { chunk =>
      input.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()

    val finals = spark.table("decay_scale").as[RateReading].collect()
      .filter(!_.timed_out)
      .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n_so_far) }
    assert(finals.keySet === want.keySet)
    finals.foreach { case (k, reading) =>
      val (n, cnt) = want(k)
      assert(reading.n_so_far === n,
        s"key $k: every event must be folded exactly once")
      assert(math.abs(reading.decayed_count - cnt) <= 1e-12 * cnt,
        s"key $k: streaming counter ${reading.decayed_count} != " +
          s"SQL fold $cnt beyond the pow-intrinsic ulp budget")
      assert(reading.rate_per_sec ===
        reading.decayed_count * math.log(2.0) / (HalfLifeMs / 1000.0))
    }

    val rate = ev.length / secs
    println(f"[stream-decay] ${ev.length}%d events / " +
      f"${ev.grouped(5000).size}%d micro-batches in $secs%.1f s " +
      f"= $rate%.0f events/s; keys=${finals.size}%d")
    PerfGate.check(rate, 100.0, "streaming decayed-rate")
  }
}
