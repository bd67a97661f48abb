package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Scratch profiling for the minhash path at sf0.1.
  * Run: sbt "Test/runMain graft.DebugMinhash" */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.table(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    println("docs=" + docs.count() +
      " total_chars=" + docs.agg(sum(length(col("text")))).head.getLong(0))
    for (_ <- 1 to 2) {
      val grams = TextDedup.shingles(docs)
      time("shingles.count")(grams.count())
      time("sha2+hex count")(grams.select(
        graft.functions.CoreFunctions.hexPrefixToLong(sha2(col("gram"), 256)).as("h"))
        .filter(col("h") > 0).count())
      time("xxhash count")(grams.select(xxhash64(col("gram")).as("h"))
        .filter(col("h") =!= 0).count())
      val sigs = TextDedup.minhashSignatures(grams)
      time("signatures")(sigs.count())
      time("candidatePairs")(TextDedup.candidatePairs(
        TextDedup.minhashSignatures(TextDedup.shingles(docs))).count())
    }
    spark.stop()
  }
}
