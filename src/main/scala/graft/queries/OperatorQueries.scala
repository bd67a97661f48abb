package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ingest.{DlqReplay, IngestPipeline, SyntheticData}
import graft.operators.Multimodal

/** Library-operator queries (SURVEY §2A A2–A15, A18 + multimodal EXT):
  * full pipeline runs over deterministic synthetic envelopes. These exercise
  * JSON re-serialization (to_json field ordering is engine-specific), so
  * the driver records rows-only checks; the per-operator semantics are
  * oracle-checked by q01–q08 and unit-tested in the scalatest suites.
  */
object OperatorQueries {

  private val fixedTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private def cfg = IngestPipeline.Config(auditRate = 0.8,
    receivedAt = Some(fixedTs))

  val all: Seq[EngineQuery] = Seq(

    // A2–A12,A18 — synthetic push bodies through the full ingest chain.
    EngineQuery("q41_ingest_e2e",
      (s, _) => IngestPipeline.run(
          SyntheticData.envelopes(s, 2000), cfg)
        .events.orderBy("idempotency_key"),
      None),

    // A13/A14 — DLQ side output with the HTTP-status taxonomy.
    EngineQuery("q42_ingest_dlq",
      (s, _) => IngestPipeline.run(
          SyntheticData.envelopes(s, 2000), cfg)
        .dlq.orderBy("data"),
      None),

    // A15 — replay routing over a synthetic DLQ with attempt counts.
    EngineQuery("q43_dlq_replay_routed",
      (s, _) => {
        val dlq = IngestPipeline.run(SyntheticData.envelopes(s, 2000), cfg)
          .dlq.withColumn("replay_attempts",
            (abs(hash(col("data"))) % 5).cast("int"))
        val routed = DlqReplay.route(dlq, maxAttempts = 3)
        routed.replay.withColumn("route", lit("replay"))
          .unionByName(routed.parked
            .withColumn("route", lit("park"))
            .withColumn("replay_attempts", col("x_final_attempt_count")),
            allowMissingColumns = true)
          .select("data", "error_type", "replay_attempts", "route")
          .orderBy("data", "route")
      },
      None),

    // EXT — multimodal binary pipeline: bytes → partition-batched stub
    // decode → flat feature rows.
    EngineQuery("q44_multimodal_pipeline",
      (s, dir) => {
        implicit val sp = s
        Multimodal.extractFeatures(
            Multimodal.mediaFromDocuments(Tables.table(s, dir, "documents")))
          .toDF()
          .select(col("media_id"), col("mime"), col("n_bytes"),
            col("width"), col("height"), col("n_frames"),
            size(col("embedding")).as("embedding_dim"))
          .orderBy("media_id")
      },
      None)
  )
}
