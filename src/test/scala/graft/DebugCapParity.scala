package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Scratch check: engine bucket cap vs the oracle's rank-cap CTE must
  * agree when buckets actually overflow. Writes the engine result with a
  * tiny cap for a DuckDB-side diff. Run: sbt "Test/runMain graft.DebugCapParity" */
object DebugCapParity {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.table(spark, dir, "documents")
    val sigs = TextDedup.minhashSignatures(TextDedup.shingles(docs))
    TextDedup.candidatePairs(sigs, maxBucketSize = 3)
      .orderBy("doc_a", "doc_b")
      .write.mode("overwrite").parquet("/tmp/cap_parity/engine")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    TextDedup.simhashNearDups(TextDedup.simhashFingerprints(toks),
        maxHamming = 12, maxBucketSize = 3)
      .orderBy("doc_a", "doc_b")
      .write.mode("overwrite").parquet("/tmp/cap_parity/engine_simhash")
    spark.stop()
  }
}
