package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Debug tool (kept, like DebugObserve): demonstrates WHY a partitioned
  * fact join can silently miss dynamic partition pruning. Finding: the
  * dim-side predicate must match Catalyst's isLikelySelective PATTERNS
  * (attribute-vs-literal comparison, IN, LIKE, ...) — a bare boolean
  * flag column does NOT qualify, and writing `=== true` doesn't help
  * because BooleanSimplification reduces it back to the bare attribute
  * before PartitionPruning runs. Every probe below therefore prints
  * dpp=false; ScaleOpsSpec's DPP test shows the qualifying shape
  * (label = 'first'). Operational takeaway for 100 TB layouts: express
  * dim filters as value comparisons, not precomputed boolean flags.
  */
object DebugDpp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("debug-dpp")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("dpp-fact").toString
    val dimOut = java.nio.file.Files.createTempDirectory("dpp-dim").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("occurred_date", to_date(col("ts")))
      .write.partitionBy("occurred_date").mode("overwrite").parquet(out)
    val fact = spark.read.parquet(out)
    println("n partitions (dates) = " +
      fact.select("occurred_date").distinct().count())
    val firstDate = fact.select(min(col("occurred_date"))).head().getDate(0)
    fact.select(col("occurred_date").as("d")).distinct()
      .withColumn("is_first", col("d") === lit(firstDate))
      .write.mode("overwrite").parquet(dimOut)

    println("dpp.enabled = " + spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled"))
    println("reuseBroadcastOnly = " + spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"))
    println("exchangeReuse = " + spark.conf.getOption(
      "spark.sql.exchange.reuse"))
    // SQL-over-views path for comparison
    fact.createOrReplaceTempView("fact_t")
    spark.read.parquet(dimOut).createOrReplaceTempView("dim_t")
    val viaSql = spark.sql(
      """SELECT * FROM fact_t JOIN dim_t ON occurred_date = d
        |WHERE is_first""".stripMargin)
    println("viaSql dpp = " +
      viaSql.queryExecution.optimizedPlan.toString.contains("dynamicpruning"))

    for (useStats <- Seq("true", "false");
         fallback <- Seq("0.5", "10.0")) {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", useStats)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", fallback)
      val dim = spark.read.parquet(dimOut).filter(col("is_first"))
      val joined = fact.join(dim, col("occurred_date") === col("d"))
      val opt = joined.queryExecution.optimizedPlan.toString
      val hit = opt.contains("dynamicpruning")
      println(s"useStats=$useStats fallback=$fallback -> dpp=$hit")
      if (!hit && useStats == "false" && fallback == "10.0")
        println(opt.linesIterator.take(12).map("  " + _).mkString("\n"))
    }
    spark.stop()
  }
}
