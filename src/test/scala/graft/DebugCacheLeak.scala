package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Probe: does ConnectedComponents free its per-round caches?
  *
  * Runs CC on a 64-node chain (many propagation rounds) and prints the
  * block-manager RDD count + bytes before, after, and after freeing the
  * result. Round-12 adjudication of the suspected select-wrapped
  * unpersist mismatch: `labeled.unpersist()` from round 2 on is a
  * Project over the cached plan, and CacheManager's cascade=false match
  * is exact-plan `sameResult` — if the counts grow with rounds, every
  * round's |V|-row cache leaks until session end.
  */
object DebugCacheLeak {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    def storage(tag: String): Unit = {
      val s = spark.sparkContext.getRDDStorageInfo
      println(f"[cache-leak] $tag: ${s.length}%d RDDs, " +
        f"${s.map(_.memSize).sum / 1e3}%.1f KB")
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc(); Thread.sleep(500)
    storage("before")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("u", "v")
    val nodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct()
    val lbl = ConnectedComponents.labels(edges, nodes)
    val n = lbl.count()
    println(s"[cache-leak] labels rows=$n")
    storage("after labels()")
    spark.stop()
  }
}
