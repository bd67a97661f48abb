package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the graph-centrality
  * scorer a curation pipeline runs on the document/embedding KNN graph
  * to pick REPRESENTATIVE samples (coreset selection: high-centrality
  * nodes sit in dense similarity neighbourhoods; unusual documents score
  * low). The reference has no graph surface (its dedup stops at pairwise
  * audits); engine-original, standard power iteration.
  *
  * Cross-engine exactness (the q71/q83 fixed-point discipline, taken all
  * the way): ranks live ENTIRELY in an integer ×1e9 domain — every node
  * starts at 1e9; a node's per-edge contribution is `rank_fp div
  * out_degree` (floor division); the damped update is
  * `0.15·1e9 + (85 · Σ contributions) div 100`, all BIGINT arithmetic.
  * No float ever enters the loop, so partition order provably cannot
  * move a single bit, and a SQL oracle unrolls the loop with `//` to
  * the same integers. Iteration count is FIXED (not convergence-tested)
  * for the same reason as kmeansCentroids: an external oracle must be
  * able to unroll it.
  *
  * Dangling nodes (out-degree 0) keep the teleport mass only — their
  * rank mass is not redistributed (the simple formulation; total mass
  * decays slightly, identical in both engines).
  *
  * Scale shape per iteration: one shuffle join of edges against the
  * |V|-row rank frame on src, one keyed sum on dst with map-side
  * partials, one left join back to the node universe. Degrees are
  * computed ONCE before the loop. Nothing collects to the driver.
  *
  * The loop is fully LAZY — one job at the caller's action, no
  * per-round materialization. That differs deliberately from the
  * ConnectedComponents discipline (eager per-round lineage cuts): CC's
  * pointer jump SELF-joins each round's output, doubling the plan per
  * round (exponential), and its round count is data-dependent. Here no
  * frame joins itself, so plan depth grows LINEARLY with the fixed
  * iteration count, which the `iterations ≤ 20` cap bounds — analysis
  * stays cheap and Spark pipelines the whole power iteration into one
  * job. The edge frame is consumed `iterations`+1 times inside that
  * job: PASS A PERSISTED EDGE FRAME (as q104 does with its shared KNN
  * frame) unless recomputing the edge lineage per round is acceptable.
  */
object PageRank {

  val Scale = 1000000000L // 1e9 fixed-point domain
  val TeleportFp = 150000000L // 0.15 × Scale
  val DampNum = 85L // 0.85 as 85/100 in integer arithmetic

  /** Rank every node of `nodes` (first column = node id) over directed
    * `edges` (first two columns = src, dst).
    *
    * @return (<nodes' id column>, rank_fp: long ×1e9) — callers divide
    *         by 1e9 for presentation.
    */
  def ranksFp(edges: DataFrame, nodes: DataFrame, iterations: Int = 3)
      : DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      "fixed iteration count must stay oracle-unrollable")
    val idCol = nodes.columns.head
    val Array(srcCol, dstCol, _*) = edges.columns
    val e = edges.select(col(srcCol).as("pr_src"), col(dstCol).as("pr_dst"))
    val deg = e.groupBy("pr_src").agg(count(lit(1)).as("pr_deg"))
    val universe = nodes.select(col(idCol).as("pr_id")).distinct()
    var rank = universe.withColumn("pr_fp", lit(Scale))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(rank.withColumnRenamed("pr_id", "pr_src"), "pr_src")
        .join(deg, "pr_src")
        .select(col("pr_dst"), expr("pr_fp div pr_deg").as("pr_contrib"))
        .groupBy("pr_dst").agg(sum(col("pr_contrib")).as("pr_mass"))
      rank = universe
        .join(contribs.withColumnRenamed("pr_dst", "pr_id"), Seq("pr_id"), "left")
        .select(col("pr_id"),
          (lit(TeleportFp) +
            expr(s"($DampNum * coalesce(pr_mass, CAST(0 AS BIGINT))) div 100"))
            .as("pr_fp"))
    }
    rank.select(col("pr_id").as(idCol), col("pr_fp").as("rank_fp"))
  }

  /** PERSONALIZED PageRank: teleport mass lands ONLY on `seeds`
    * (uniformly), so ranks measure importance RELATIVE to the seed
    * set — "which documents sit in the curated set's neighbourhood",
    * the seeded-expansion dual of [[ranksFp]]'s global centrality.
    * Same all-BIGINT ×1e9 algebra: the per-node teleport is
    * `(0.15·Scale·|V|) div |S|` for seeds and 0 elsewhere (total
    * teleport mass matches the global variant's 0.15·Scale·|V|, so
    * the two scores are comparable), the start vector is the full
    * Scale·|V| mass spread over the seeds, and |V|/|S| enter as
    * 1-row broadcast scalars — never a driver-side count. */
  def personalizedRanksFp(edges: DataFrame, nodes: DataFrame,
      seeds: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      "fixed iteration count must stay oracle-unrollable")
    val idCol = nodes.columns.head
    val Array(srcCol, dstCol, _*) = edges.columns
    val e = edges.select(col(srcCol).as("pr_src"), col(dstCol).as("pr_dst"))
    val deg = e.groupBy("pr_src").agg(count(lit(1)).as("pr_deg"))
    val universe = nodes.select(col(idCol).as("pr_id")).distinct()
    val seedSet = seeds.select(col(seeds.columns.head).as("pr_id"))
      .distinct().withColumn("pr_is_seed", lit(1L))
    val scalars = universe.agg(count(lit(1)).as("pr_n"))
      .crossJoin(seedSet.agg(count(lit(1)).as("pr_ns")))
    val base = universe
      .join(broadcast(seedSet), Seq("pr_id"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("pr_id"),
        coalesce(col("pr_is_seed"), lit(0L)).as("pr_is_seed"),
        col("pr_n"), col("pr_ns"))
    var rank = base.select(col("pr_id"),
      when(col("pr_is_seed") === 1L, expr(s"($Scale * pr_n) div pr_ns"))
        .otherwise(lit(0L)).as("pr_fp"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(rank.withColumnRenamed("pr_id", "pr_src"), "pr_src")
        .join(deg, "pr_src")
        .select(col("pr_dst"), expr("pr_fp div pr_deg").as("pr_contrib"))
        .groupBy("pr_dst").agg(sum(col("pr_contrib")).as("pr_mass"))
      rank = base
        .join(contribs.withColumnRenamed("pr_dst", "pr_id"),
          Seq("pr_id"), "left")
        .select(col("pr_id"),
          (when(col("pr_is_seed") === 1L,
            expr(s"($TeleportFp * pr_n) div pr_ns")).otherwise(lit(0L)) +
            expr(s"($DampNum * coalesce(pr_mass, CAST(0 AS BIGINT))) div 100"))
            .as("pr_fp"))
    }
    rank.select(col("pr_id").as(idCol), col("pr_fp").as("ppr_fp"))
  }
}
