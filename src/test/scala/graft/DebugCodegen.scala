package graft

import org.apache.spark.sql.execution.debug._
import graft.ingest.{IngestPipeline, SyntheticData}

/** Scratch diagnostics: per-WholeStageCodegen bytecode stats for the
  * ingest events path. Run: sbt "Test/runMain graft.DebugCodegen" */
object DebugCodegen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val fixedTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val cfg = IngestPipeline.Config(auditRate = 0.8, receivedAt = Some(fixedTs))
    val ev = IngestPipeline.run(SyntheticData.envelopes(spark, 2000), cfg).events
    codegenStringSeq(ev.queryExecution.executedPlan).zipWithIndex.foreach {
      case ((subtree, code, stats), i) =>
        println(s"=== subtree $i: stats=$stats codeLines=${code.count(_ == '\n')}")
        println(subtree.linesIterator.take(14).mkString("\n"))
    }
    spark.stop()
  }
}
