package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** A17 — structured metrics (reference logger.js + docs/monitoring.md):
  * the reference derives counters from pino JSON logs; here they are
  * first-class engine constructs — Observation metrics on the dataflow,
  * a typed Aggregator for the observed-sampling-rate ratio, and a
  * StreamingQueryListener for per-batch throughput.
  */
object Metrics {

  /** Attach ingest counters to a pipeline frame without an extra pass:
    * Observation metrics are collected piggyback on the next action.
    * Returns (instrumented df, observation handle). */
  def observeIngest(df: DataFrame, name: String = "ingest")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val instrumented = df.observe(obs,
      count(lit(1)).as("n_total"),
      sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
      sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
    (instrumented, obs)
  }

  /** Observed sampling rate = kept / total (docs/monitoring.md:40-86) as
    * a typed Aggregator — the engine's UDAF surface. Input: the sampled
    * flag; output: ratio in [0,1] (NaN-free: 0 on empty). */
  object ObservedSamplingRate extends Aggregator[Boolean, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), kept: Boolean): (Long, Long) =
      (b._1 + (if (kept) 1L else 0L), b._2 + 1L)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) 0.0 else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register observed_sampling_rate for SQL use. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("observed_sampling_rate", udaf(ObservedSamplingRate))

  /** Per-micro-batch throughput snapshot (rows/sec, batch duration). */
  final case class BatchProgress(batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double)

  /** Streaming listener capturing per-batch progress — the engine analog
    * of the reference's log-based throughput metrics. */
  final class ProgressListener extends StreamingQueryListener {
    val batches = ArrayBuffer.empty[BatchProgress]
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      batches.synchronized {
        batches += BatchProgress(e.progress.batchId,
          e.progress.numInputRows, e.progress.processedRowsPerSecond)
      }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
