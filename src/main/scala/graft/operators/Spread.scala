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
  * The width never shrinks below the input's natural splits
  * (`max(defaultParallelism, current)`), and the count is explicit
  * because AQE would coalesce a small exchange back to one partition —
  * it optimizes shuffle bytes, not the amplified CPU downstream.
  *
  * Caveat: probing the natural width plans the input (and, for frames
  * that already contain exchanges, materializes them as a job under
  * AQE). Call with scan-level frames; pre-partitioned derived inputs
  * should skip the spread and carry their own keyed partitioning.
  */
object Spread {

  def byKey(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(math.max(p, df.rdd.getNumPartitions), key)
  }
}
