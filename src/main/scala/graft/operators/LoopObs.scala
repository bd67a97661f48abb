package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}

/** Fold a fixpoint loop's per-round row count into the round's eager
  * checkpoint job via `observe()` — the loops previously ran a separate
  * `count()` action per round for their convergence test, one whole
  * extra scheduler round-trip on a frame the checkpoint job had JUST
  * materialized (r14 optimization; the q332 Observation A/B proved the
  * pattern in round 11).
  *
  * `Dataset.localCheckpoint()`/`checkpoint()` run under `withAction`, so
  * the SQLExecutionEnd event fires and `Observation.get` returns the
  * metric collected DURING the materialization (verified empirically,
  * including the zero-row case with AQE off — DebugObsCheckpoint). The
  * checkpoint truncates lineage to a leaf, so the CollectMetrics node
  * never appears in downstream plans (no observed-name clashes, no
  * DeduplicateRelations trap — the q332 round-11 lessons).
  *
  * Robustness: `Observation.get` blocks on the listener bus; a dropped
  * event (bus overload) would hang a loop forever, so the wait is
  * bounded and falls back to a plain `count()` on the already-cached
  * checkpoint frame — same value, one cheap extra job, never a hang. */
private[graft] object LoopObs {

  /** The observed metric `n` collected during a just-run checkpoint
    * job; `fallback` recomputes the same value with a plain action if
    * the listener event never arrives (it must be semantically
    * IDENTICAL to the observed aggregate, not merely similar). */
  def metric(obs: Observation)(fallback: => Long): Long =
    try {
      val fut = scala.concurrent.Future(obs.get)(
        scala.concurrent.ExecutionContext.global)
      scala.concurrent.Await
        .result(fut, scala.concurrent.duration.Duration(30, "s"))("n") match {
          case l: java.lang.Long => l.longValue()
          case other => other.toString.toLong
        }
    } catch {
      case _: java.util.concurrent.TimeoutException => fallback
    }

  /** [[metric]] for the common case where the observed aggregate is
    * `count(lit(1))` over the checkpointed frame itself. */
  def count(obs: Observation, cut: DataFrame): Long =
    metric(obs)(cut.count())
}
