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
}
