package graft

import graft.ingest.{IngestPipeline, SyntheticData}

/** Scratch: standalone ingest throughput, 3 passes.
  * Run: sbt "Test/runMain graft.DebugThroughput" */
object DebugThroughput {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val kept = IngestPipeline.run(SyntheticData.envelopes(spark, 200000L))
        .events.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass $i: ${200000 / sec}%.0f env/s ($sec%.2f s, kept=$kept)")
    }
    spark.stop()
  }
}
