package graft

import org.apache.spark.sql.SparkSession

/** Scratch smoke main: verifies Spark can read every driver table,
  * especially the nanosecond-timestamp events table. */
object SmokeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.chunkBase64String.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"OK $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"FAIL $t: ${e.getMessage.take(300)}")
      }
    }
    println("ANSI=" + spark.conf.get("spark.sql.ansi.enabled"))
    spark.stop()
  }
}
