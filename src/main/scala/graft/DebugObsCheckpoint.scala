package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: does Dataset.localCheckpoint()'s eager materialization
  * deliver observe() metrics (i.e. run under withAction so
  * SQLExecutionEnd fires)? If yes, fixpoint loops can fold their
  * per-round count() into the checkpoint job. */
object DebugObsCheckpoint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 1000).toDF("id")
    val obs = Observation("probe")
    val t0 = System.nanoTime()
    val cut = df.filter(col("id") % 3 === 0)
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint()
    val t1 = System.nanoTime()
    def timedGet(o: Observation): String = {
      val fut = scala.concurrent.Future(o.get)(
        scala.concurrent.ExecutionContext.global)
      try s"get=${scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration(5, "s"))}"
      catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
    }
    val got = timedGet(obs)
    println(s"[obs] after localCheckpoint: $got (cut took ${(t1 - t0) / 1e6} ms)")
    // and the observed frame still reads correctly
    println(s"[obs] count=${cut.count()} (expect 334)")
    // empty-result case: does the metric still arrive with AQE off?
    val obs2 = Observation("probe2")
    val cut2 = df.filter(col("id") < 0)
      .observe(obs2, count(lit(1)).as("n")).localCheckpoint()
    println(s"[obs] empty case: ${timedGet(obs2)} rows=${cut2.count()}")
    spark.stop()
  }
}
