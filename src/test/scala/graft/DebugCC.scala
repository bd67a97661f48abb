package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, TextDedup}

/** Scratch profiling for the duplicate-clustering loop.
  * Run: sbt "Test/runMain graft.DebugCC [sfDir] [minBands]"
  * Defaults mirror the PRODUCTION pipeline exactly: the q75 edge floor
  * comes from TextQueries.ClusterMinBands so this harness cannot drift
  * from the calibrated setting. */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val minBands =
      args.lift(1).map(_.toInt).getOrElse(queries.TextQueries.ClusterMinBands)
    println(s"dir=$dir minBands=$minBands")
    val docs = Tables.table(spark, dir, "documents")
    val grams = TextDedup.shingles(docs)
    val sigs = TextDedup.minhashSignatures(grams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = TextDedup.candidatePairs(sigs)
      .filter(col("n_shared_bands") >= minBands)
      .select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("edges=" + pairs.count())
    for (trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val lbl = ConnectedComponents.labels(pairs, docs.select("doc_id"))
      val n = lbl.count()
      val nClusters = lbl.select("cluster_id").distinct().count()
      println(f"trial $trial: ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        s"nodes=$n clusters=$nClusters")
    }
    spark.stop()
  }
}
