package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Keyed pre-amplification spreading (PLANS.md "Under-partitioned scans
  * ahead of amplifying stages").
  *
  * Row-amplifying stages — shingle/token explodes (~300×), per-vector
  * centroid fan-outs — should receive their input (a) wide enough to use
  * the whole cluster and (b) hash-partitioned on the per-entity key,
  * because every downstream per-key operator (groupBy aggregates, window
  * ranks) requires exactly that distribution and would otherwise insert
  * its own exchange ABOVE the amplification, shuffling ~300× the bytes.
  * Moving the one exchange below the amplification, where rows are
  * narrowest, is the cheapest place it can ever sit.
  *
  * The width never shrinks below the input's natural width
  * (`max(defaultParallelism, planned output partitioning)`), and the
  * count is explicit because AQE would coalesce a small exchange back to
  * one partition — it optimizes shuffle bytes, not the amplified CPU
  * downstream.
  *
  * The natural-width probe reads the PLANNED physical output
  * partitioning (`queryExecution.sparkPlan`, the pre-AQE plan): pure
  * planning, never a job — handing byKey a derived frame that already
  * contains exchanges is safe (an earlier revision probed
  * `df.rdd.getNumPartitions`, which under AQE materializes upstream
  * exchanges as a job). File scans plan `UnknownPartitioning(0)`, so
  * they get `defaultParallelism` — every core, the right width for an
  * amplifying stage on any cluster size. Callers that know better pass
  * `width` explicitly.
  */
object Spread {

  def byKey(df: DataFrame, key: Column, width: Int = 0): DataFrame = {
    val w =
      if (width > 0) width
      else {
        val p = df.sparkSession.sparkContext.defaultParallelism
        val planned =
          df.queryExecution.sparkPlan.outputPartitioning.numPartitions
        math.max(p, planned)
      }
    df.repartition(w, key)
  }
}
