package graft

import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import graft.queries.QueryRegistry

/** Debug tool: prints the build-side subtree of every
  * BroadcastNestedLoopJoin in the named queries' plans — the evidence
  * base for PlanLintSpec's bnljBuildAllowlist justifications. */
object DebugBnlj {
  def main(args: Array[String]): Unit = {
    val spark = GenScaleProbe.benchSession()
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      val phys = QueryRegistry.byName(name).run(spark, dir)
        .queryExecution.sparkPlan
      val bnljs = phys.collect { case b: BroadcastNestedLoopJoinExec => b }
      println(s"==== $name: ${bnljs.length} BNLJ")
      bnljs.zipWithIndex.foreach { case (b, i) =>
        val build = if (b.buildSide == BuildLeft) b.left else b.right
        println(s"-- $name#$i build side:")
        println(build.treeString.linesIterator.take(12)
          .map("   " + _).mkString("\n"))
      }
    }
    spark.stop()
  }
}
