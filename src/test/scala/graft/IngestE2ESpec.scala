package graft

import java.util.Base64
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{DlqReplay, IngestPipeline}

/** End-to-end DLQ loop mirroring the reference's Milestone D script
  * (scripts/03_dlq_and_replay.js:15-77) as ONE spec driving the real
  * pipeline + replay objects:
  *
  *   publish malformed → lands in DLQ (4xx) → replay job routes it →
  *   corrected copy re-ingests successfully → the uncorrected copy
  *   cycles DLQ→replay→DLQ, accumulating its transport attempt
  *   counter, and parks at attempt 3.
  *
  * The individual stages have their own specs (IngestPipelineSpec);
  * this one asserts the LOOP composes — in particular that the replay
  * counter survives a re-ingestion failure (attribute pass-through,
  * replay-dlq-job.js:25), without which the parking lot could never
  * trigger and a poison message would replay forever.
  */
class IngestE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def b64(s: String) =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private val fixedTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val cfg = IngestPipeline.Config(receivedAt = Some(fixedTs))

  /** createMalformedEnvelope (03_dlq_and_replay.js:16-30): missing
    * tenant_id → terminal 4xx; createCorrectedEnvelope (js:32-36) adds
    * tenant_id = org-dlq-replayed. */
  private def dlqEnvelope(tenantId: Option[String]) = {
    val tenant = tenantId.map(t => s""""tenant_id":"$t",""").getOrElse("")
    s"""{"envelope_version":"1","event_type":"call.metadata",
       |"schema_version":"1",$tenant"occurred_at":"2024-06-01T09:00:00Z",
       |"trace_id":"tr-dlq","source":"dlq-test",
       |"payload":{"call_id":"call-dlq-test-42",
       |"caller":"+14155550001","callee":"+14155550002",
       |"duration":123}}""".stripMargin.replace("\n", "")
  }

  test("DLQ loop: malformed → DLQ → replay → corrected re-ingest succeeds; poison parks at attempt 3") {
    // 1. publish one malformed + one healthy message (js:41-49)
    val raw = Seq(
      ("m-bad", b64(dlqEnvelope(None))),
      ("m-good", b64(dlqEnvelope(Some("org-healthy"))))
    ).toDF("message_id", "data")
    val res = IngestPipeline.run(raw, cfg)

    // 2. the malformed message is in the DLQ with a 4xx and a zeroed
    //    attempt counter; the healthy one reached the warehouse (js:52-57)
    assert(res.events.count() === 1)
    assert(res.events.filter(col("tenant_id") === "org-healthy").count() === 1)
    val d = res.dlq.collect()
    assert(d.length === 1)
    assert(d.head.getAs[String]("message_id") === "m-bad")
    assert(d.head.getAs[String]("error_type") === "missing_fields")
    assert(d.head.getAs[Int]("http_status") === 400)
    assert(d.head.getAs[Int]("replay_attempts") === 0)

    // 3. replay job pulls the DLQ and routes: first pass replays with an
    //    incremented counter, nothing parks yet (js:59-63)
    val pass1 = DlqReplay.route(res.dlq, maxAttempts = 3,
      replayTimestamp = Some(fixedTs))
    assert(pass1.parked.count() === 0)
    val replayed1 = pass1.replay.collect()
    assert(replayed1.length === 1)
    assert(replayed1.head.getAs[Int]("replay_attempts") === 1)
    assert(replayed1.head.getAs[String]("x_original_message_id") === "m-bad")

    // 4a. the CORRECTED copy (operator fixed tenant_id, js:32-36, 59-63)
    //     re-ingests successfully end-to-end (js:65-77)
    val corrected = pass1.replay
      .withColumn("data", lit(b64(dlqEnvelope(Some("org-dlq-replayed")))))
    val res2 = IngestPipeline.run(corrected, cfg)
    assert(res2.dlq.count() === 0)
    val replayedRow = res2.events.collect().head
    assert(replayedRow.getAs[String]("tenant_id") === "org-dlq-replayed")
    assert(replayedRow.getAs[String]("payload").contains("call-dlq-test-42"),
      "reference verification query keys on payload call_id (js:70-74)")
    assert(replayedRow.getAs[String]("idempotency_key") === "call-dlq-test-42")

    // 4b. the UNCORRECTED copy is poison: each re-ingestion fails back to
    //     the DLQ carrying its accumulated attempt counter; the third
    //     route call parks it instead of replaying (replay-dlq-job.js:40-46)
    var dlqFrame: DataFrame = res.dlq
    var parked: DataFrame = null
    var routed = 0
    for (attempt <- 1 to 3) {
      val pass = DlqReplay.route(dlqFrame, maxAttempts = 3,
        replayTimestamp = Some(fixedTs))
      routed += 1
      if (attempt < 3) {
        assert(pass.parked.count() === 0, s"parked too early at $attempt")
        val r = pass.replay.collect()
        assert(r.length === 1)
        assert(r.head.getAs[Int]("replay_attempts") === attempt)
        // re-ingest the still-broken body: it must fail AGAIN and keep
        // the incremented counter (transport attribute pass-through)
        val reRes = IngestPipeline.run(
          pass.replay.select("message_id", "data", "replay_attempts"), cfg)
        assert(reRes.events.count() === 0)
        val rd = reRes.dlq.collect()
        assert(rd.length === 1)
        assert(rd.head.getAs[String]("error_type") === "missing_fields")
        assert(rd.head.getAs[Int]("replay_attempts") === attempt,
          "attempt counter must survive re-ingestion")
        dlqFrame = reRes.dlq
      } else {
        // third pull: attempts == 2... routed to replay once more? No —
        // the loop re-ingested twice, so attempts is 2 < 3: route
        // replays at 3; the NEXT failure parks. Drive that final cycle:
        val r3 = pass.replay.collect()
        assert(r3.length === 1 && r3.head.getAs[Int]("replay_attempts") === 3)
        val reRes = IngestPipeline.run(
          pass.replay.select("message_id", "data", "replay_attempts"), cfg)
        val finalPass = DlqReplay.route(reRes.dlq, maxAttempts = 3,
          replayTimestamp = Some(fixedTs))
        assert(finalPass.replay.count() === 0,
          "exhausted message must not replay again")
        parked = finalPass.parked
      }
    }
    assert(routed === 3)
    val p = parked.collect()
    assert(p.length === 1)
    assert(p.head.getAs[String]("x_parked_reason")
      .contains("Exceeded max replay attempts (3)"))
    assert(p.head.getAs[Int]("x_final_attempt_count") === 4)
    assert(p.head.getAs[String]("x_original_message_id") === "m-bad")
  }
}
