package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (optimization round): decompose the driver-side
  * build cost of the Catalog.registerAll + spark.sql battery queries. */
object DebugBuildCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[dbg] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm-up
    for (t <- Tables.starTables) Tables.table(spark, sfDir, t).count()
    Tables.events(spark, sfDir).count()
    for (i <- 1 to 3) {
      time(s"registerAll #$i") { Catalog.registerAll(spark, sfDir) }
      time(s"read lineitem #$i") { Tables.table(spark, sfDir, "lineitem") }
      time(s"read events #$i") { Tables.events(spark, sfDir) }
      val df = time(s"sql-analyze q265 #$i") {
        spark.sql("""
          |SELECT p.p_brand,
          |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |    / 7.0 AS avg_yearly
          |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |WHERE l.l_quantity < (
          |  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          |  WHERE l2.l_partkey = p.p_partkey)
          |GROUP BY p.p_brand
          |ORDER BY p.p_brand""".stripMargin)
      }
      time(s"q265 plan #$i") { df.queryExecution.executedPlan }
      time(s"q265 count #$i") { df.count() }
    }
    spark.stop()
  }
}
