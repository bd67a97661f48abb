package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage release for EAGER checkpoint frames.
  *
  * `localCheckpoint()`/`checkpoint()` back the returned frame with a
  * cached RDD that is NOT registered in the CacheManager, so
  * `Dataset.unpersist` cannot free it; the ContextCleaner frees it only
  * when the driver GCs the last reference. Fixed-point loops and
  * long-running streaming monitors that cut lineage every round/batch
  * must not lease storage memory to GC timing — they free the previous
  * round's blocks explicitly the moment the next round's frame is
  * materialized.
  */
private[graft] object Frames {

  /** Free the cached blocks behind an eager-checkpointed `df`.
    *
    * UNSAFE unless nothing will ever read `df` (or an un-materialized
    * derivation of it) again: the cached blocks ARE the data — lineage
    * was truncated at the checkpoint, so a later action cannot
    * recompute them. No-op on frames with no checkpoint leaf (e.g. the
    * empty seed state).
    *
    * Works under both lineage-cut modes of the loop operators'
    * `durableCheckpoints` lever: for `localCheckpoint()` frames this
    * frees the executor-cached blocks that ARE the data; for reliable
    * `checkpoint()` frames the data lives in checkpoint-dir FILES and
    * the unpersist is a harmless no-op (file cleanup belongs to
    * `spark.cleaner.referenceTracking.cleanCheckpoints`/job teardown,
    * not per-round storage accounting). */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
