package graft

/** One-off probe for the bench q26 warm-pass question (round-10 #4):
  * times q26 across passes in one session and prints the persist-set
  * accounting after each, separating the shared-sig build cost (first
  * touch) from the per-pass band-join cost that can never cache.
  * Run: sbt "Test/runMain graft.DebugQ26Warm /root/testdata/sf0.1"
  */
object DebugQ26Warm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    def store(tag: String): Unit = {
      val s = spark.sparkContext.getRDDStorageInfo
      println(f"[q26warm] $tag: ${s.length} RDDs, " +
        f"${s.map(_.memSize).sum / 1e6}%.1f MB mem, " +
        f"${s.map(_.diskSize).sum / 1e6}%.1f MB disk, " +
        s.map(r => s"id=${r.id}:${r.numCachedPartitions}/${r.numPartitions}")
          .mkString(" "))
    }
    // isolate the sig-frame build: force-materialize it alone
    val t0 = System.nanoTime()
    val sigs = graft.queries.TextQueries.minhashSigs(spark, dir)
    val nSigs = sigs.count()
    println(f"[q26warm] sig build+count: ${(System.nanoTime() - t0) / 1e9}%.2f s ($nSigs rows)")
    store("after sig build")
    for (pass <- 1 to 4) {
      val t = System.nanoTime()
      val n = SparkEntry.queries("q26_minhash_candidates")(spark, dir).count()
      println(f"[q26warm] pass $pass: ${(System.nanoTime() - t) / 1e9}%.2f s ($n rows)")
      store(s"after pass $pass")
    }
    spark.stop()
  }
}
