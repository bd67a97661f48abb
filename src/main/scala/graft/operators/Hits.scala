package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (hubs & authorities) over a directed edge
  * list — the link-analysis dual of [[PageRank]]: authorities are
  * pointed AT by good hubs, hubs point TO good authorities. On the
  * document/embedding KNN graph the authority score is a density
  * signal (how many well-connected neighbourhoods cite you) and the
  * hub score marks broad connectors — both feed coreset selection
  * next to q104's PageRank. The reference has no graph surface;
  * engine-original, standard Kleinberg iteration.
  *
  * Cross-engine exactness (the PageRank.ranksFp discipline): scores
  * live ENTIRELY in an integer ×1e9 domain. Each node starts with hub
  * mass `1e9 div |V|` (total ≈ 1e9), so every un-normalized sum stays
  * ≤ 1e9 and the L1 normalization `raw · 1e9 div Σraw` multiplies at
  * most 1e9·1e9 < 2^63 — no overflow at ANY graph size, no float ever
  * enters the loop, and a SQL oracle unrolls the iterations with `//`
  * to the same integers. Iteration count is FIXED so the oracle can
  * unroll it.
  *
  * Per iteration: authority = Σ over in-edges of hub, then L1
  * normalize; hub = Σ over out-edges of the NEW authority, then L1
  * normalize. Each half is one shuffle join of edges against the
  * |V|-row score frame plus one keyed sum; the L1 total is a 1-row
  * broadcast (never a driver-side collect). Pass a persisted edge
  * frame — it is consumed 2·iterations times.
  *
  * Structure history: the universe join per half-step is the r10
  * measured optimum (dropping it to keep sparse frames hangs totals
  * off BROADCAST subtrees, which are not reused — 59 s, exponential
  * re-execution; keep the universe join). The r10/r11 A/Bs also kept
  * the loop FULLY LAZY (eager cuts then measured 8.2 s vs 6.8 s), but
  * that verdict predated LoopTuning's loop-sized shuffles + codegen
  * gating AND under-weighed the driver side: the lazy unrolled tree
  * doubles twice per iteration (~4^iterations Catalyst nodes), costing
  * ~5.6 s of per-evaluation analysis+optimization at 3 iterations
  * (ProfileBench r14). With loop conf applied, per-half-step eager
  * cuts of the narrow (id, score) frames measure 6.7 → 3.0 s on q284
  * (min-of-3, r14) with bit-identical integers. See scoresFp.
  *
  * Nodes with no in-edges (or no out-edges) get authority (hub) 0 via
  * the left join; isolated nodes survive with both scores 0.
  */
object Hits {

  val Scale = 1000000000L // 1e9 fixed-point domain

  /** Score every node of `nodes` (first column = node id) over
    * directed `edges` (first two columns = src, dst).
    *
    * @param durableCheckpoints cut each half-step with reliable
    *                `checkpoint()` (requires `setCheckpointDir`)
    *                instead of the default eager `localCheckpoint()` —
    *                on a cluster the durable cut bounds an executor
    *                loss to one half-step. Cost-only lever: the
    *                integer fixed-point scores are bit-identical
    *                either way (DurableCheckpointParitySpec).
    * @return (<nodes' id column>, hub_fp, auth_fp) — ×1e9 longs.
    */
  def scoresFp(edges: DataFrame, nodes: DataFrame, iterations: Int = 3,
      durableCheckpoints: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      "fixed iteration count must stay oracle-unrollable")
    // r14: each half-step is EAGERLY lineage-cut. The lazy unrolled
    // form this replaces (kept through r13 on the strength of the
    // r10/r11 A/Bs) doubles the logical tree TWICE per iteration
    // (each half-step references the previous frame in both its raw
    // sum and its L1 total), i.e. ~4^iterations plan nodes: at 3
    // iterations the DRIVER paid ~4.1 s of eager per-operator analysis
    // + ~1.5 s of optimization per q284 evaluation (ProfileBench r14)
    // — the execution itself was fine (ReuseExchange dedupes), the
    // Catalyst tree walk was the cost. Cutting each half-step keeps
    // every plan constant-size; the cut frames are (id, score) pairs —
    // 2 longs × |V| — so the "checkpoint forces every column" penalty
    // behind the r11 14.8 s rejection does not apply (that A/B cut the
    // FINAL wide joined frame, not the narrow per-half-step scores),
    // and the per-cut job latency is bounded by LoopTuning (loop-sized
    // shuffles, AQE off, codegen off below the row threshold).
    // Measured q284 (min-of-3, quiet box): 6.7 s lazy → 3.0 s eager,
    // identical integers (oracle-regated at sf0.01 + sf0.1).
    def cut(df: DataFrame): DataFrame =
      if (durableCheckpoints) df.checkpoint() else df.localCheckpoint()
    val idCol = nodes.columns.head
    val Array(srcCol, dstCol, _*) = edges.columns
    val e = edges.select(col(srcCol).as("ht_src"), col(dstCol).as("ht_dst"))
    val universe = nodes.select(col(idCol).as("ht_id")).distinct()
    val nRow = universe.agg(count(lit(1)).as("ht_n"))
    // the count sizes the loop conf AND materializes the caller's edge
    // cache (knnShared-style frames are persisted upstream)
    val edgeRows = e.count()
    LoopTuning.withLoopConf(edges.sparkSession, edgeRows) {
    var hub = cut(universe.crossJoin(broadcast(nRow))
      .select(col("ht_id"), expr(s"$Scale div ht_n").as("ht_h")))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = e
        .join(hub.withColumnRenamed("ht_id", "ht_src"), "ht_src")
        .groupBy(col("ht_dst").as("ht_id"))
        .agg(sum("ht_h").as("ht_raw"))
      val aTot = aRaw.agg(sum("ht_raw").as("ht_tot"))
      auth = cut(universe
        .join(aRaw, Seq("ht_id"), "left")
        .crossJoin(broadcast(aTot))
        .select(col("ht_id"),
          // ht_tot NULL (edge-free graph) or 0 (Scale div n underflow
          // at |V| > Scale) makes the div NULL — those are exactly the
          // zero-mass iterations, so the normalized score is 0, keeping
          // the "isolated nodes survive with both scores 0" contract.
          expr(s"coalesce(coalesce(ht_raw, CAST(0 AS BIGINT)) * $Scale" +
              " div ht_tot, CAST(0 AS BIGINT))")
            .as("ht_a")))
      val hRaw = e
        .join(auth.withColumnRenamed("ht_id", "ht_dst"), "ht_dst")
        .groupBy(col("ht_src").as("ht_id"))
        .agg(sum("ht_a").as("ht_raw"))
      val hTot = hRaw.agg(sum("ht_raw").as("ht_tot"))
      hub = cut(universe
        .join(hRaw, Seq("ht_id"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("ht_id"),
          expr(s"coalesce(coalesce(ht_raw, CAST(0 AS BIGINT)) * $Scale" +
              " div ht_tot, CAST(0 AS BIGINT))")
            .as("ht_h")))
    }
    // The FINAL join stays lazy (outside the cuts): hub/auth are leaf
    // frames, so the consumer's action plans a 3-node join — the r11
    // "final frame must stay lazy" finding (its eager cut forced every
    // normalization column and measured 7.6 → 14.8 s) is preserved;
    // only the per-half-step score frames are cut.
    hub.join(auth, "ht_id")
      .select(col("ht_id").as(idCol), col("ht_h").as("hub_fp"),
        col("ht_a").as("auth_fp"))
    }
  }
}
