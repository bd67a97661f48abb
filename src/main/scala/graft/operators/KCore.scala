package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core decomposition by iterative peeling — the dense-
  * subgraph screen that separates a similarity graph's cohesive regions
  * from its tendrils: the k-core is the (unique) maximal subgraph in
  * which every node keeps degree ≥ k AFTER all lower-degree nodes are
  * recursively removed. A node of raw degree ≥ k still falls out of the
  * core when its support was other peeled nodes — exactly the
  * "mutually-supported dense cluster" semantics a near-dup or KNN graph
  * audit wants, and one strictly stronger than a degree filter (the
  * reference's graph surface stops at pairwise duplicate audits,
  * `/root/reference/scripts/02_idempotency_test.js:125` — this is
  * engine-original, after Batagelj–Zaveršnik's peeling formulation).
  *
  * Algorithm: repeat { drop every edge with an endpoint of current
  * degree < k } until the edge set stops changing. The surviving edge
  * set IS the k-core's edge set; peeling is deterministic and the edge
  * count strictly decreases every non-final round, so the loop
  * terminates in ≤ peel-depth rounds.
  *
  * Scale design (100 TB):
  *   - each round is ONE keyed count aggregation (map-side partials;
  *     the shuffle carries |V| rows) plus two left-semi joins of the
  *     edge frame against the ≥k survivor ids — all key-partitioned,
  *     nothing collects to the driver (the loop reads back one scalar
  *     per round: the surviving-edge count, which doubles as the
  *     convergence test).
  *   - round count is the graph's peel depth, NOT its diameter: for
  *     degree-capped similarity graphs (mutual-KNN with k ≤ 5 has max
  *     degree 5) depth is small by construction; a pathological chain
  *     peels one layer per round, which maxIter guards against
  *     silently looping.
  *   - lineage is cut EVERY round (eager localCheckpoint, or reliable
  *     checkpoint() via `durableCheckpoints` on clusters where an
  *     executor loss mid-loop must not fail the job — the
  *     ConnectedComponents discipline), so the per-round plan is
  *     constant-size however many rounds run.
  */
object KCore {

  /** Surviving edge set of the k-core.
    *
    * @param edges SYMMETRIC directed edge list — both (u,v) and (v,u)
    *              present, no self-loops; the first two columns are the
    *              endpoint ids (the [[graft.operators.ConnectedComponents]]
    *              edge convention, and what a mutual-KNN join emits
    *              naturally). Degree of u = row count with u first.
    * @param k     minimum within-core degree (≥ 1)
    * @return the edges of the k-core, same two column names, still
    *         symmetric; empty when no k-core exists. References
    *         executor-cached state from the final round's lineage cut.
    * @throws IllegalStateException after `maxIter` rounds without a
    *         fixpoint (never returns a partially peeled graph)
    */
  def coreEdges(edges: DataFrame, k: Int, maxIter: Int = 100,
      durableCheckpoints: Boolean = false): DataFrame = {
    require(k >= 1, "k must be at least 1")
    def cut(df: DataFrame): DataFrame =
      if (durableCheckpoints) df.checkpoint() else df.localCheckpoint()
    val Array(srcCol, dstCol, _*) = edges.columns
    var cur = cut(edges.select(col(srcCol).as("kc_a"), col(dstCol).as("kc_b")))
    var n = cur.count()
    // loop-sized shuffles + AQE off for the peel rounds (LoopTuning,
    // r14 — this was the one fixpoint operator still running its
    // |E|-row rounds at session width with AQE barriers); the survivor
    // count rides each round's checkpoint job as an observed metric
    // (LoopObs) instead of a second count() action — 2 jobs → 1/round
    LoopTuning.withLoopConf(edges.sparkSession, n) {
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      round += 1
      val good = cur.groupBy("kc_a").agg(count(lit(1)).as("kc_d"))
        .filter(col("kc_d") >= k).select("kc_a")
      val obs = org.apache.spark.sql.Observation(s"kcore_round_$round")
      val nxt = cut(cur
        .join(good, Seq("kc_a"), "left_semi")
        .join(good.withColumnRenamed("kc_a", "kc_b"), Seq("kc_b"), "left_semi")
        .select("kc_a", "kc_b")
        .observe(obs, count(lit(1)).as("n")))
      val m = LoopObs.count(obs, nxt)
      converged = m == n
      cur = nxt
      n = m
    }
    if (!converged) throw new IllegalStateException(
      s"k-core peeling did not converge in $maxIter rounds " +
        "(peel depth exceeds maxIter — raise it)")
    cur.select(col("kc_a").as(srcCol), col("kc_b").as(dstCol))
    }
  }

  /** Nodes of the k-core with their within-core degree — the per-node
    * report form of [[coreEdges]]: (<src column name>, core_degree). */
  def coreNodes(edges: DataFrame, k: Int, maxIter: Int = 100,
      durableCheckpoints: Boolean = false): DataFrame = {
    val srcCol = edges.columns.head
    coreEdges(edges, k, maxIter, durableCheckpoints)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("core_degree"))
  }
}
