package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{CandidatePair, DocEvent, ExactVerdict}

/** Streaming incremental dedup: verdicts against state carried across
  * micro-batches, plus bit-parity of the row-local signature with the
  * batch MinHash operator. */
class StreamingDedupSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8
  private val other = "completely different content about spark engines " * 6

  test("row-local signature is bit-identical to batch minhashSignatures") {
    val docs = Seq((0L, base), (1L, other),
      (2L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text")
    val batch = TextDedup.minhashSignatures(TextDedup.shingles(docs))
      .as[(Long, Int, Long)].collect()
      .map { case (id, band, mh) => (id, band) -> mh }.toMap
    for ((id, text) <- Seq((0L, base), (1L, other),
        (2L, base.replace("lazy", "sleepy")))) {
      val sig = StreamingDedup.signature(text)
      assert(sig.length === 8)
      sig.zipWithIndex.foreach { case (mh, band) =>
        assert(batch((id, band)) === mh,
          s"doc $id band $band: streaming $mh != batch ${batch((id, band))}")
      }
    }
    // short doc: no shingles either way
    assert(StreamingDedup.signature("short").isEmpty)
  }

  test("exact verdicts: first arrival keeps, later duplicates flag across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = StreamingDedup.exactVerdicts(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("exact_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdex").toString)
      .start()
    // batch 1: two distinct docs plus an in-batch duplicate (5 beats 7
    // by the min-id rule)
    input.addData(DocEvent(5L, base), DocEvent(7L, base), DocEvent(6L, other))
    q.processAllAvailable()
    // batch 2: a late duplicate of batch-1 content + a new doc
    input.addData(DocEvent(9L, base), DocEvent(10L, "fresh content entirely " * 8))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("exact_out").as[ExactVerdict].collect()
      .map(v => v.doc_id -> ((v.keeper_id, v.is_duplicate))).toMap
    assert(got === Map(
      5L -> ((5L, false)), 7L -> ((5L, true)), 6L -> ((6L, false)),
      9L -> ((5L, true)), 10L -> ((10L, false))))
  }

  test("near-dup candidates: an arriving duplicate pairs against buckets from earlier batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = StreamingDedup.candidatePairs(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("cand_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdlsh").toString)
      .start()
    // batch 1: the corpus so far — base doc + an unrelated doc
    input.addData(DocEvent(0L, base), DocEvent(3L, other))
    q.processAllAvailable()
    // batch 2: an exact duplicate of doc 0 arrives later
    input.addData(DocEvent(1L, base))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("cand_out").as[CandidatePair].collect()
    val byPair = pairs.groupBy(p => (p.doc_a, p.doc_b))
    // the exact duplicate collides with doc 0 in ALL 8 band buckets —
    // the batch operator's n_shared_bands invariant, incrementally
    assert(byPair.get((0L, 1L)).map(_.length) === Some(8))
    assert(byPair((0L, 1L)).map(_.band).sorted.toSeq === (0 until 8))
    // unrelated docs never pair
    assert(!byPair.contains((0L, 3L)) && !byPair.contains((1L, 3L)))
  }

  test("state beans survive the RocksDB state store (production provider)") {
    // the cluster-deployment state path: RocksDB serializes state rows
    // through the same encoders but persists them off-heap/on-disk —
    // a bean that only works in the default in-memory provider would
    // fail here, at the provider swap a real deployment makes
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[DocEvent]
      val q = StreamingDedup.exactVerdicts(input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("exact_rocks_out")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sdrocks").toString)
        .start()
      input.addData(DocEvent(1L, base), DocEvent(2L, other))
      q.processAllAvailable()
      input.addData(DocEvent(3L, base)) // duplicate vs RocksDB state
      q.processAllAvailable()
      q.stop()
      val got = spark.table("exact_rocks_out").as[ExactVerdict].collect()
        .map(v => v.doc_id -> ((v.keeper_id, v.is_duplicate))).toMap
      assert(got === Map(1L -> ((1L, false)), 2L -> ((2L, false)),
        3L -> ((1L, true))))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
