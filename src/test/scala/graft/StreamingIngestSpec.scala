package graft

import java.nio.file.Files
import java.util.Base64
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.IngestPipeline
import graft.streaming.StreamingIngest

class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def b64(s: String) =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private val fixedTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val cfg = IngestPipeline.Config(receivedAt = Some(fixedTs))

  private def envelope(callId: String) =
    s"""{"envelope_version":"1","event_type":"call.completed","schema_version":"2","tenant_id":"t1","occurred_at":"2024-05-01T10:00:00Z","trace_id":"tr","source":"stream","payload":{"call_id":"$callId","caller":"(415) 555-0001"}}"""

  test("streaming ingest: micro-batches flow through the same pipeline with cross-batch dedup (A1/A11/A12)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val raw = input.toDF().toDF("message_id", "data")
    val events = StreamingIngest.eventsStream(raw, cfg)
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val sink = new scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val q = StreamingIngest.start(events, checkpoint) { (batch, id) =>
      sink.synchronized {
        sink ++= batch.select("idempotency_key").as[String](
          org.apache.spark.sql.Encoders.STRING).collect().map(_ -> id)
      }
    }
    // batch 1: two distinct + one duplicate-within-batch
    input.addData(("m1", b64(envelope("c1"))), ("m2", b64(envelope("c2"))),
      ("m3", b64(envelope("c1"))))
    q.processAllAvailable()
    // batch 2: replay of c1 (cross-batch duplicate) + a new key
    input.addData(("m4", b64(envelope("c1"))), ("m5", b64(envelope("c3"))))
    StreamingIngest.drainAndStop(q)
    val keys = sink.map(_._1).sorted
    assert(keys === Seq("c1", "c2", "c3"),
      s"watermarked dropDuplicates must collapse within AND across batches: $sink")
  }

  test("streaming DLQ side output routes terminal errors (A13/A14)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val raw = input.toDF().toDF("message_id", "data")
    val dlq = StreamingIngest.dlqStream(raw)
    val checkpoint = Files.createTempDirectory("graft-ckpt-dlq").toString
    val q = dlq.writeStream.outputMode("append")
      .format("memory").queryName("dlq_out")
      .option("checkpointLocation", checkpoint).start()
    input.addData(("m1", b64("garbage")),
      ("m2", b64(envelope("ok-1"))))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dlq_out")
      .select("error_type", "http_status").as[(String, Int)].collect()
    assert(rows.toSeq === Seq(("invalid_json", 422)))
  }

  test("trigger mapping honors the reference batching defaults (batchProcessor.js:8-9)") {
    import org.apache.spark.sql.streaming.Trigger
    assert(StreamingIngest.trigger(0) === Trigger.ProcessingTime(0L))
    assert(StreamingIngest.trigger(100) === Trigger.ProcessingTime(100L))
  }
}
