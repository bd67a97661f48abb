package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.DocEvent

/** Restart/recovery for [[StreamingDedup]]'s two stateful operators
  * (extending the StreamingClusters/StatefulSessionizer fault pattern
  * to the dedup monitor): kill the query mid-corpus after committed
  * triggers, restart from the same checkpoint, and assert the output
  * across both incarnations equals an UNINTERRUPTED run of the same
  * chunked stream — same chunk boundaries, so the arrival-order rules
  * are identical and the comparison is exact.
  *
  * What restart must restore, per operator:
  *   - exactVerdicts: the content-hash → keeper map. A post-restart
  *     duplicate of pre-kill content must point at the PRE-KILL keeper;
  *     a fresh state store would re-admit it as an original.
  *   - candidatePairs: the (band, minhash) → bucket-member lists. A
  *     post-restart doc must pair against members stored BEFORE the
  *     kill; fresh state would silently drop every cross-boundary pair.
  *
  * Corpus: sf0.01 documents (500 docs with genuine near-dup structure —
  * 40,956 candidate-pair rows), streamed in 500-doc chunks, cut at the
  * midpoint; the full-corpus scale tier is StreamingDedupScaleSpec's
  * job, this spec owns the fault boundary.
  */
class StreamingDedupRestartSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs: Array[DocEvent] =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[DocEvent].collect().sortBy(_.doc_id)

  private def runStream[T](build: org.apache.spark.sql.Dataset[DocEvent]
        => org.apache.spark.sql.Dataset[T],
      chunks: Seq[Seq[DocEvent]], killAfter: Option[Int]): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val checkpoint = Files.createTempDirectory("graft-dedup-restart").toString
    val outDir = Files.createTempDirectory("graft-dedup-restart-out").toString
    def start() = build(input.toDS())
      .toDF()
      .writeStream.outputMode("append")
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .start()
    var q = start()
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      if (killAfter.contains(i)) { q.stop(); q = start() }
      input.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    spark.read.parquet(outDir).collect().map(_.toString).toSeq
  }

  test("exactVerdicts: kill+restart mid-corpus equals the uninterrupted run") {
    // the corpus has near-dups but no byte-exact ones, so the keeper-map
    // restoration needs INJECTED exact duplicates: copies of 100
    // pre-kill documents (fresh ids) appended AFTER the kill point —
    // only a restored content-hash → keeper state can resolve them to
    // their pre-kill keepers
    val dupes = docs.take(100).map(d => DocEvent(d.doc_id + 1000000L, d.text))
    val all = docs ++ dupes
    val chunks = all.grouped(500).map(_.toSeq).toSeq
    def op(ds: org.apache.spark.sql.Dataset[DocEvent]) =
      StreamingDedup.exactVerdicts(ds)
    val uninterrupted = runStream(op, chunks, None)
    val restarted = runStream(op, chunks, Some(chunks.length / 2))
    // one verdict per doc, exactly once, across the kill
    assert(restarted.length === all.length)
    assert(restarted.length === restarted.toSet.size,
      "duplicate verdict emissions across the restart boundary")
    // keeper map RESTORED: post-restart duplicates of pre-kill content
    // resolve to the pre-kill keeper, so the full verdict sets match
    assert(restarted.toSet === uninterrupted.toSet)
    val nDups = restarted.count(_.contains("true"))
    assert(nDups >= dupes.length,
      "injected duplicates must all resolve as duplicates")
    // the injected copies point at their PRE-KILL originals
    dupes.foreach { d =>
      val orig = d.doc_id - 1000000L
      assert(restarted.exists(r => r.startsWith(s"[${d.doc_id},$orig,")),
        s"duplicate ${d.doc_id} did not resolve to pre-kill keeper $orig")
    }
    println(s"[dedup-restart] exactVerdicts: ${restarted.length} verdicts " +
      s"($nDups duplicates, 100 cross-boundary) exact across restart")
  }

  test("candidatePairs: kill+restart mid-corpus equals the uninterrupted run") {
    val chunks = docs.grouped(500).map(_.toSeq).toSeq
    def op(ds: org.apache.spark.sql.Dataset[DocEvent]) =
      StreamingDedup.candidatePairs(ds)
    val uninterrupted = runStream(op, chunks, None)
    val restarted = runStream(op, chunks, Some(chunks.length / 2))
    assert(restarted.length === restarted.toSet.size,
      "duplicate pair emissions across the restart boundary")
    assert(restarted.toSet === uninterrupted.toSet)
    // the kill must land mid-work: pairs exist on BOTH sides of it,
    // including cross-boundary pairs only a restored bucket state finds
    assert(restarted.nonEmpty)
    println(s"[dedup-restart] candidatePairs: ${restarted.length} pair rows " +
      "exact across restart")
  }
}
