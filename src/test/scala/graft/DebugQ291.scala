package graft

/** Scratch: reproduce the sf1 q291 DIVIDE_BY_ZERO with a full stack. */
object DebugQ291 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfprobe_sf1d")
    val spark = GenScaleProbe.benchSession()
    try {
      val rows = SparkEntry.queries("q291_graph_mixing")(spark, dir).collect()
      rows.foreach(r => println(s"[dbg] q291 row=$r"))
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
