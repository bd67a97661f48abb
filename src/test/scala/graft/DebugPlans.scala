package graft

/** Scratch diagnostics: formatted plans for headline queries — check
  * PushedFilters, ReadSchema pruning, broadcast choices, codegen spans.
  * Run: sbt "Test/runMain graft.DebugPlans [queryName ...]" */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q10_star_join", "q11_snowflake_join", "q56_subqueries",
        "q60_asof_join", "q48_ivf_knn", "q14_range_join")
    names.foreach { n =>
      println(s"########## $n")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
