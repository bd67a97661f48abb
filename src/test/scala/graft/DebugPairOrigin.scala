package graft

import org.apache.spark.sql.functions._

/** Attributes q26's sf1-probe candidate pairs to within-copy vs
  * cross-copy (copy id = doc_id / 100000000L) — decides whether the
  * 27× pair growth is per-copy J-structure or cross-copy FP collisions. */
object DebugPairOrigin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfprobe_sf1d")
    val spark = GenScaleProbe.benchSession()
    val pairs = SparkEntry.queries("q26_minhash_candidates")(spark, dir)
    val tagged = pairs.withColumn("copy_a", expr("doc_a div 100000000L"))
      .withColumn("copy_b", expr("doc_b div 100000000L"))
    tagged.groupBy(col("copy_a") === col("copy_b"))
      .agg(count(lit(1)).as("n"))
      .collect().foreach(r => println(s"[pairorigin] same_copy=${r.get(0)} n=${r.getLong(1)}"))
    tagged.filter(col("copy_a") === col("copy_b"))
      .groupBy("copy_a").agg(count(lit(1)).as("n")).orderBy("copy_a")
      .collect().foreach(r => println(s"[pairorigin] copy=${r.get(0)} n=${r.getLong(1)}"))
    spark.stop()
  }
}
