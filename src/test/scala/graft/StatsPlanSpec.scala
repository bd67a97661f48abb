package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the statistics battery (q151–q170):
  * the scale-critical shapes documented in PLANS.md must survive
  * refactors — top-k windows must stay group-limited, bounded frames
  * must broadcast, and the SNM window must never sort globally.
  */
class StatsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q162 rank<=k compiles to WindowGroupLimit (map-side partial top-k)") {
    val plan = executedPlan("q162_hill_tail")
    assert(plan.contains("WindowGroupLimit"),
      s"hill-tail top-k must push into WindowGroupLimit:\n$plan")
  }

  test("q159 joins the k-row centroid frame via broadcast, never a shuffle cross") {
    val plan = executedPlan("q159_silhouette")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"silhouette centroid join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"silhouette must not plan a shuffle cartesian:\n$plan")
  }

  test("q154 SNM window partitions by the block key (no global sort window)") {
    val analyzed = SparkEntry.queries("q154_sorted_neighborhood")(spark, dir)
      .queryExecution.optimizedPlan.toString
    // the lag window must carry a partitionBy spec — an empty
    // partition spec would mean one global single-task sort
    assert(analyzed.contains("windowspecdefinition(blk"),
      s"SNM lag window must partition by blk:\n$analyzed")
  }

  test("q151/q153 totals join back as broadcasts (no fact-fact shuffle join)") {
    for (q <- Seq("q151_event_transitions", "q153_ab_conversion")) {
      val plan = executedPlan(q)
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$q totals must broadcast:\n$plan")
    }
  }

  test("q167 cumulative counters use the sharded prefix join, not one global window") {
    val analyzed = SparkEntry.queries("q167_novelty_curve")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(analyzed.contains("windowspecdefinition(shard"),
      s"novelty running sums must shard-partition:\n$analyzed")
  }
  test("q202/q213 pair joins keep the explicit spread exchange (BNLJ parallelism)") {
    for (q <- Seq("q202_theilsen_trend", "q213_kendall_tau")) {
      val plan = executedPlan(q)
      // the repartition(32, d1) must survive to the physical plan as a
      // hashpartitioning exchange feeding the nested-loop join -- AQE
      // coalescing it away would serialize the 2.9M pair evaluations
      assert(plan.contains("hashpartitioning(d1"),
        s"$q must spread the pair-join stream side:\n$plan")
    }
  }

  test("q199/q200 rank windows partition by event type (no global sort window)") {
    for (q <- Seq("q199_mannwhitney_u", "q200_ks_cohort")) {
      val analyzed = SparkEntry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(analyzed.contains("windowspecdefinition(event_type"),
        s"$q cumulative windows must partition by event_type:\n$analyzed")
    }
  }

  test("q216 probe side broadcasts; never a shuffle cartesian") {
    val plan = executedPlan("q216_triplet_margin")
    assert(!plan.contains("CartesianProduct"),
      s"triplet margin must not plan a shuffle cartesian:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n$plan")
  }

  test("q228 FK audit plans LEFT ANTI joins, not subquery re-scans per row") {
    val plan = executedPlan("q228_fk_conformance")
    assert(plan.contains("LeftAnti"),
      s"orphan checks must be anti joins:\n$plan")
  }

  test("q226 erasure cascade pre-limits the customer side before lineitem") {
    val plan = executedPlan("q226_erasure_audit")
    assert(plan.contains("BroadcastHashJoin"),
      s"top-10 customer frame must broadcast into the cascade:\n$plan")
  }

  test("q264/q267 subqueries decorrelate to joins (no per-row re-execution)") {
    // the correlated MIN-equality must become an aggregate + equi join
    val q264 = executedPlan("q264_cheapest_supplier")
    assert(q264.contains("HashAggregate") &&
      !q264.contains("CartesianProduct"),
      s"Q2 shape must decorrelate:\n$q264")
    // EXISTS/NOT EXISTS must become semi/anti joins on the order key
    val q267 = executedPlan("q267_waiting_suppliers")
    assert(q267.contains("LeftSemi"), s"EXISTS must plan semi:\n$q267")
    assert(q267.contains("LeftAnti"), s"NOT EXISTS must plan anti:\n$q267")
  }
}
