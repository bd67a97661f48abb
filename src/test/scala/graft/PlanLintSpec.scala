package graft

import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QueryRegistry

/** Registry-wide STRUCTURAL plan lint: walks every registry entry's
  * plan at the smallest SF and enforces the scale disciplines that
  * were previously per-query convention (StatsPlanSpec pins specific
  * shapes; this pins the invariants for ALL current and future
  * entries):
  *
  *   1. no CartesianProductExec anywhere — every cross join in the
  *      engine must ride a broadcast of a bounded frame, which plans
  *      as BroadcastNestedLoopJoin, never a shuffle cartesian;
  *   2. no unpartitioned Window (empty PARTITION BY ⇒ one global
  *      single-task sort) outside an explicit allowlist, where every
  *      allowlisted entry carries its bounded-frame justification —
  *      adding a global-sort window over an unbounded frame fails CI
  *      until it is either partitioned (shard-decomposed prefix-sum
  *      pattern) or justified here.
  *
  * The allowlist is verified two-sided: an entry whose query no longer
  * plans an unpartitioned window is STALE and fails the suite, so the
  * list can only shrink unless a human writes a new justification.
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed to plan an unpartitioned window, each with the
    * reason the windowed frame is bounded (aggregated, top-k, or
    * domain-limited) — NEVER raw fact rows. */
  private val unpartitionedWindowAllowlist: Map[String, String] = Map(
    "q86_sequence_packing" -> "shard-local windows + broadcast |shards|-row prefix join; the unpartitioned window covers only the |shards| frame",
    "q88_vocab_coverage" -> "window over the 100-row top-k token frame; corpus total joins as broadcast 1-row",
    "q100_bpe_pair_stats" -> "window over the 50-row top-pair aggregate frame (vocabulary-sized, aggregate-first)",
    "q115_cluster_size_histogram" -> "window over the |distinct cluster sizes| aggregate frame",
    "q119_dsir_importance" -> "window over the 1024-row hashed-bucket table; weights broadcast back",
    "q120_temperature_mix" -> "window over the |sources| frame after map-side-combined aggregation",
    "q122_key_skew_audit" -> "rank/cumulative window over the TakeOrdered 20-row top-key frame",
    "q129_user_gini" -> "grouped-count Gini: window over the |distinct count values| histogram frame",
    "q139_packing_efficiency" -> "derived from the q86 shard frame; final window over the |shards| prefix frame",
    "q143_bm25_topk" -> "window over the fixed-point-ranked top-20 retrieval frame",
    "q157_neyman_allocation" -> "running total over the |strata| (event_type) frame — sequential by design for defined add order",
    "q158_benford_audit" -> "chi-squared accumulation over the 9-row first-digit frame",
    "q161_psi_drift" -> "PSI total over the fixed 50-unit bin frame",
    "q163_km_survival" -> "at-risk/survival running sums over the |distinct days| calendar-bounded frame",
    "q167_novelty_curve" -> "q86 shard-decomposed prefix: unpartitioned window only on the |shards| frame",
    "q178_revenue_concentration" -> "cumulative share over the TakeOrdered 100-row whale frame",
    "q181_power_iteration" -> "fixed-point rescale windows over the 64-row dimension frame",
    "q185_projection_histogram" -> "bin assignment over the bounded fixed-width projection-bin frame",
    "q194_chi2_independence" -> "chi-squared accumulation over the |years|x|priorities| contingency frame",
    "q201_runs_test" -> "lag/run count over the calendar-bounded |days| daily frame",
    "q202_theilsen_trend" -> "median pick over bucketed slope counts; windows on the |buckets| frame, pairs stay distributed",
    "q206_rfm_segments" -> "RFM quintile ntiles over the per-customer aggregate under a total order; output rolls to <=125 segments",
    "q207_abc_parts" -> "cumulative revenue classes over the |parts| aggregate frame with exact integer edges",
    "q212_jsd_sources" -> "fixed-point JSD sum over the two-source word-distribution aggregate frame",
    "q214_spearman_rho" -> "average-rank windows over the |distinct daily values| frame (doubled-integer ranks)",
    "q215_bollinger_breakouts" -> "trailing 20-day windows over the calendar-bounded |days| frame",
    "q217_equidepth_histogram" -> "value-range-sharded prefix sums; unpartitioned window only on the |distinct cents values| / shard frame",
    "q218_mcv_stats" -> "MCV rank over per-column top-5 aggregate frames",
    "q223_mood_median" -> "grand-median element pick over the |distinct values| frame",
    "q225_compaction_plan" -> "greedy bin cumsum over the bounded |ship months| frame",
    "q241_skyline_customers" -> "running max over per-balance-bucket sharded frames + |buckets| combine frame",
    "q247_binary_segmentation" -> "prefix sums + argmax over the calendar-bounded |days| frame",
    "q248_max_drawdown" -> "running peak/drawdown over the calendar-bounded |days| daily frame",
    "q251_abc_xyz" -> "class edges over the |parts| aggregate frame, exact integer cross-multiplication",
    "q254_repeat_interval" -> "median element pick over the |distinct gap values| frame; lags partition by customer",
    "q256_peak_concurrency" -> "within-day sweeps partition BY DAY; only the |days|-row carry frame is sequential",
    "q260_hll_intersection" -> "rank over the 2-row event-type frame; register math on 256-row frames",
    "q283_supplier_skyline" -> "Skyline.maxMax sharded prefix-max: the unpartitioned suffix-max window covers only the ≤257-row shard-max frame",
    "q296_quota_allocation" -> "largest-remainder rank over the nation×segment aggregate frame (≤ 125 rows, domain-bounded)",
    "q320_crosscorrelation" -> "lag windows over the calendar-bounded |days| daily frame (the q201/q215/q248 precedent)",
    "q321_kmv_union" -> "rank alignment over the two ≤256-row bottom-k sketch frames; per-type partials partition by event_type")

  private def plans(name: String) = {
    val qe = QueryRegistry.byName(name).run(spark, dir).queryExecution
    (qe.optimizedPlan, qe.sparkPlan)
  }

  private def unpartitionedWindows(p: LogicalPlan): Seq[LWindow] =
    p.collectWithSubqueries { case w: LWindow if w.partitionSpec.isEmpty => w }

  test("no registry query plans a shuffle CartesianProduct") {
    val offenders = QueryRegistry.all.flatMap { q =>
      val (_, phys) = plans(q.name)
      // plain collect: SparkPlan subquery expressions may still hold
      // un-planned LOGICAL subtrees at this stage, which poisons
      // collectWithSubqueries with a ClassCastException
      val carts = phys.collect { case c: CartesianProductExec => c }
      if (carts.nonEmpty) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"shuffle cartesians in: ${offenders.sorted.mkString(", ")}")
  }

  test("unpartitioned windows only where a bounded-frame justification exists") {
    val offenders = QueryRegistry.all.flatMap { q =>
      val (opt, _) = plans(q.name)
      val bad = unpartitionedWindows(opt)
      if (bad.nonEmpty && !unpartitionedWindowAllowlist.contains(q.name))
        Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"unjustified global-sort windows in: ${offenders.sorted.mkString(", ")}")
  }

  /** Queries allowed a BroadcastNestedLoopJoin whose build side is not
    * STRUCTURALLY provably bounded (no Aggregate/GlobalLimit/
    * TakeOrdered/LocalTableScan in the build subtree) — each with the
    * reason the broadcast frame is bounded anyway. Typical cause: the
    * bounded frame was localCheckpointed (an opaque RDD scan) or is
    * bounded by a selective literal filter the lint can't size. */
  private val bnljBuildAllowlist: Map[String, String] = Map.empty

  /** The build subtree proves its own boundedness when it aggregates
    * (output ≤ |groups|, and every engine cross-join rides a ≤k-row or
    * 1-row aggregate/top-k frame by convention), hard-limits, or is a
    * literal local table. InMemoryTableScan is a LEAF whose cached
    * plan holds the actual subtree (the centroid caches aggregate
    * INSIDE the cache) — descend into it. */
  private def provablyBounded(build: SparkPlan): Boolean = {
    val hit = build.collectFirst {
      case _: HashAggregateExec => ()
      case _: ObjectHashAggregateExec => ()
      case _: SortAggregateExec => ()
      case _: GlobalLimitExec => ()
      case _: TakeOrderedAndProjectExec => ()
      case _: LocalTableScanExec => ()
    }.isDefined
    hit || build.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan
      // a cached plan is itself wrapped in an AdaptiveSparkPlanExec
      // LEAF — descend into its input plan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
    }.exists(provablyBounded)
  }

  private def unboundedBnlj(phys: SparkPlan): Seq[BroadcastNestedLoopJoinExec] =
    phys.collect {
      case b: BroadcastNestedLoopJoinExec if !provablyBounded(
        if (b.buildSide == BuildLeft) b.left else b.right) => b
    }

  test("every BroadcastNestedLoopJoin build side is provably bounded") {
    val offenders = QueryRegistry.all.flatMap { q =>
      val (_, phys) = plans(q.name)
      if (unboundedBnlj(phys).nonEmpty &&
          !bnljBuildAllowlist.contains(q.name)) Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"BNLJ with unproven build-side bound in: ${offenders.sorted.mkString(", ")}")
  }

  test("the BNLJ allowlist carries no stale entries") {
    val stale = bnljBuildAllowlist.keys.filter { name =>
      assert(QueryRegistry.byName.contains(name),
        s"BNLJ allowlist names unknown query $name")
      val (_, phys) = plans(name)
      unboundedBnlj(phys).isEmpty
    }
    assert(stale.isEmpty,
      s"BNLJ-allowlisted but clean: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("the allowlist carries no stale entries") {
    val stale = unpartitionedWindowAllowlist.keys.filter { name =>
      assert(QueryRegistry.byName.contains(name),
        s"allowlist names unknown query $name")
      val (opt, _) = plans(name)
      unpartitionedWindows(opt).isEmpty
    }
    assert(stale.isEmpty,
      s"allowlisted but no longer unpartitioned: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
