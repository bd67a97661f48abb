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
  * broadcast (never a driver-side collect). Like PageRank the loop is
  * fully lazy; pass a persisted edge frame — it is consumed
  * 2·iterations times.
  *
  * This exact structure is the measured optimum of three variants at
  * sf0.1 (steady, ScaleProbe): lazy with the per-half-step |V|-row
  * universe join 6.8 s; adding eager localCheckpoints per half-step
  * 8.2 s (job overhead > recomputation saved — ReuseExchange already
  * dedupes the L1 total's second reference through the SHUFFLE
  * boundaries the universe join creates); dropping the universe joins
  * to keep sparse frames 59 s (the totals then hang off BROADCAST
  * subtrees, which do not get reused, so every iteration re-executes
  * the whole preceding chain — exponential). Keep the universe join.
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
    *                `checkpoint()` (requires `setCheckpointDir`). The
    *                DEFAULT loop is deliberately fully lazy (the r11
    *                A/B below: any eager per-half-step cut measured
    *                7.6 → 14.8 s on q284 because checkpoint boundaries
    *                defeat Catalyst's column pruning), but lazy means
    *                the whole 2·iterations-join chain recomputes from
    *                the scan on task retry — on a cluster with real
    *                executor churn the durable cut bounds a loss to
    *                one half-step. Cost-only lever: the integer
    *                fixed-point scores are bit-identical either way
    *                (DurableCheckpointParitySpec).
    * @return (<nodes' id column>, hub_fp, auth_fp) — ×1e9 longs.
    */
  def scoresFp(edges: DataFrame, nodes: DataFrame, iterations: Int = 3,
      durableCheckpoints: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      "fixed iteration count must stay oracle-unrollable")
    def cut(df: DataFrame): DataFrame =
      if (durableCheckpoints) df.checkpoint() else df
    val idCol = nodes.columns.head
    val Array(srcCol, dstCol, _*) = edges.columns
    val e = edges.select(col(srcCol).as("ht_src"), col(dstCol).as("ht_dst"))
    val universe = nodes.select(col(idCol).as("ht_id")).distinct()
    val nRow = universe.agg(count(lit(1)).as("ht_n"))
    var hub = universe.crossJoin(broadcast(nRow))
      .select(col("ht_id"), expr(s"$Scale div ht_n").as("ht_h"))
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
    // STAYS LAZY deliberately — round-11 A/B: materializing here (an
    // eager localCheckpoint, with or without AQE) measured 7.6 → 14.8 s
    // steady on q284, because the consumer's action lets Catalyst PRUNE
    // through this projection (a count never computes the score
    // columns' normalizations), and a checkpoint boundary forces every
    // column to materialize. The r10 variant table in the scaladoc
    // stands: lazy + universe joins is the optimum.
    hub.join(auth, "ht_id")
      .select(col("ht_id").as(idCol), col("ht_h").as("hub_fp"),
        col("ht_a").as("auth_fp"))
  }
}
