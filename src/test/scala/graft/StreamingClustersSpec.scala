package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ConnectedComponents, TextDedup}
import graft.streaming.{StreamingClusters, StreamingDedup}
import graft.streaming.StreamingDedup.DocEvent

/** StreamingClusters: the star-collapse incremental CC must equal batch
  * CC over all edges seen, at every micro-batch boundary — the
  * induction the operator's scaladoc claims, pinned on random graphs,
  * adversarial merge chains, and the real LSH-pair pipeline. */
class StreamingClustersSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.toDF("u", "v")
    val nodes = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct()
    ConnectedComponents.labels(e, nodes)
      .as[(Long, Long)].collect().toMap
  }

  private def streamLabels(sc: StreamingClusters): Map[Long, Long] =
    sc.assignments.as[(Long, Long)].collect().toMap

  test("random edge stream equals batch CC at every batch boundary") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val sc = new StreamingClusters(spark)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    edges.grouped(30).foreach { chunk =>
      seen ++= chunk
      sc.processBatch(chunk.toDF("u", "v"))
      assert(streamLabels(sc) === batchLabels(seen.toSeq))
    }
  }

  test("late edges merging long-lived components relabel to the global min") {
    val sc = new StreamingClusters(spark)
    // two chains growing separately across batches...
    sc.processBatch(Seq((10L, 11L), (20L, 21L)).toDF("u", "v"))
    sc.processBatch(Seq((11L, 12L), (21L, 22L)).toDF("u", "v"))
    assert(streamLabels(sc) ===
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L))
    // ...then one bridge merges them: every member takes the global min
    sc.processBatch(Seq((12L, 22L)).toDF("u", "v"))
    assert(streamLabels(sc).values.toSet === Set(10L))
    assert(streamLabels(sc).keySet ===
      Set(10L, 11L, 12L, 20L, 21L, 22L))
  }

  test("foreachBatch writer drives the same parity over a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sc = new StreamingClusters(spark)
    val q = sc.writer(input.toDS())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scc").toString)
      .start()
    val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (5L, 5L))
    input.addData(all.take(2)); q.processAllAvailable()
    input.addData(all.drop(2)); q.processAllAvailable()
    q.stop()
    assert(streamLabels(sc) === batchLabels(all))
  }

  test("streamed LSH candidate pairs cluster like the batch dedup pipeline") {
    // the production wiring: StreamingDedup.candidatePairs -> edges ->
    // StreamingClusters, checked against batch minhash -> pairs -> CC
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(
      (1L, base), (2L, base.replace("lazy", "sleepy")),
      (3L, base), (4L, "completely different content about engines " * 6),
      (5L, base.replace("quick", "swift")),
      (6L, "another unrelated text body entirely here " * 6))
    val docsDF = docs.toDF("doc_id", "text")
    val sigs = TextDedup.minhashSignatures(TextDedup.shingles(docsDF))
    val batchPairs = TextDedup.candidatePairs(sigs)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSeq
    val expected = batchLabels(batchPairs)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val pairsQ = StreamingDedup.candidatePairs(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("scc_pairs")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scc-p").toString)
      .start()
    val sc = new StreamingClusters(spark)
    docs.map { case (id, text) => DocEvent(id, text) }
      .grouped(2).foreach { chunk =>
        input.addData(chunk.toSeq)
        pairsQ.processAllAvailable()
        // the memory sink accumulates, so this re-feeds earlier pairs
        // too — min-label over duplicate edges is idempotent, so the
        // parity check still exercises exactly the incremental table
        sc.processBatch(spark.table("scc_pairs")
          .select(col("doc_a").as("u"), col("doc_b").as("v")))
      }
    pairsQ.stop()
    assert(streamLabels(sc) === expected)
  }
}
