package graft.operators

import org.apache.spark.sql.SparkSession

/** Session tuning for round-synchronous fixpoint loops (Mst, Matching,
  * StableMatching, …): size the loop's shuffle width from the DATA the
  * loop actually iterates over instead of the session default, and turn
  * AQE off for the loop's tiny scheduler-latency-bound jobs.
  *
  * Rationale (measured on q332, PLANS.md round-11 A/B table): the
  * session `spark.sql.shuffle.partitions` is tuned for the scan-bound
  * queries; a fixpoint loop over a gated slice shuffles a few thousand
  * rows dozens of times, so the fixed per-task scheduling cost of
  * 32-wide shuffles — and AQE's per-stage re-planning barrier — can be
  * 5-10× the actual work. One row count picks the width (~1 partition
  * per 50k rows, capped at the session value so big inputs keep their
  * parallelism); both settings restore on exit, success or failure.
  *
  * AQE off inside loops also sidesteps two measured AQE traps: the
  * empty-relation propagation that erases CollectMetrics nodes at a
  * loop's termination round, and per-round re-planning of plans that
  * never change shape (DETERMINISM.md / PLANS.md round-11 notes).
  */
private[graft] object LoopTuning {

  /** Shuffle width for a loop iterating over `rows` rows. */
  def widthFor(spark: SparkSession, rows: Long): String = {
    val session = spark.conf.get("spark.sql.shuffle.partitions").toLong
    math.min(session, math.max(1L, rows / 50000L + 1L)).toString
  }

  // NOTE (round-11 A/B): an `evalWithoutAqe` variant for LAZY unrolled
  // plans (Hits/PageRank) — materialize the final frame once with AQE
  // off — was tried and REJECTED: a bare-conf probe suggested 9.0 →
  // 5.5 s on q284, but the real bench runs the consumer's action over
  // the LAZY plan, where Catalyst prunes the score-normalization
  // columns a count never needs; an eager checkpoint forces every
  // column and measured 7.6 → 14.8 s. Lazy operators must stay lazy —
  // this helper is only for loops that ALREADY run per-round actions.

  /** Run `body` with loop-sized shuffles and AQE off; restore after.
    * `SPARK_GRAFT_LOOP_TUNING=off` bypasses (the A/B kill-switch). */
  def withLoopConf[T](spark: SparkSession, rows: Long)(body: => T): T = {
    if (sys.env.get("SPARK_GRAFT_LOOP_TUNING").contains("off")) return body
    val sessionShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val sessionAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", widthFor(spark, rows))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", sessionShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", sessionAqe)
    }
  }
}
