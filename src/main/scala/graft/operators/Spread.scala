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
  * The natural-width probe is pure PLANNING, never a job (an earlier
  * revision probed `df.rdd.getNumPartitions`, which under AQE
  * materializes upstream exchanges): it takes the max of
  * (a) the planned physical output partitioning
  * (`queryExecution.sparkPlan`, pre-AQE — derived frames that already
  * carry exchanges report their width) and (b) the file-scan split
  * estimate `ceil(scan bytes / maxPartitionBytes)` from the leaf
  * relations' statistics — a multi-terabyte scan therefore keeps its
  * hundreds of thousands of natural splits instead of collapsing to
  * core count, preserving "the width never shrinks below the input's
  * natural width" without executing anything. Callers that know better
  * pass `width` explicitly.
  */
object Spread {

  def byKey(df: DataFrame, key: Column, width: Int = 0): DataFrame = {
    val w =
      if (width > 0) width
      else {
        val p = df.sparkSession.sparkContext.defaultParallelism
        val planned =
          df.queryExecution.sparkPlan.outputPartitioning.numPartitions
        val maxBytes =
          df.sparkSession.sessionState.conf.filesMaxPartitionBytes
        // relations WITHOUT statistics (e.g. JDBC) report the sentinel
        // spark.sql.defaultSizeInBytes (= Long.MaxValue by default), not
        // a measured size — using it would clamp the width to
        // Int.MaxValue and plan a repartition(2147483647); skip those
        // leaves and fall back to the planned width / parallelism floor
        val sentinel = df.sparkSession.sessionState.conf.defaultSizeInBytes
        val leafSplits = df.queryExecution.optimizedPlan.collectLeaves()
          .map {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
                if lr.relation.sizeInBytes != sentinel =>
              math.ceil(lr.relation.sizeInBytes.toDouble / maxBytes).toLong
            case _ => 0L
          }
        val natural = (planned.toLong +: leafSplits).max
          .min(Int.MaxValue).toInt
        math.max(p, natural)
      }
    df.repartition(w, key)
  }
}
