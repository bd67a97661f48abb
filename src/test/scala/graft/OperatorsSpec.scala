package graft

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{IngestPipeline, SyntheticData}
import graft.operators.{Metrics, WarehouseWriter}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IngestPipeline.Config(
    receivedAt = Some(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))

  test("observation metrics ride the ingest pass (A17, docs/monitoring.md)") {
    val v = IngestPipeline.sampled(IngestPipeline.validated(
      IngestPipeline.decoded(SyntheticData.envelopes(spark, 200))), cfg)
    val (instrumented, obs) = Metrics.observeIngest(v)
    instrumented.count() // one action → metrics collected piggyback
    val m = obs.get
    assert(m("n_total") === 200L)
    assert(m("n_valid").asInstanceOf[Long] < 200L) // planted invalid slices
    assert(m("n_sampled") === m("n_total")) // auditRate 1.0 samples every row
  }

  test("observed_sampling_rate UDAF matches the ratio definition (A17/B7)") {
    Metrics.register(spark)
    val df = Seq(true, true, false, true, false).toDF("sampled")
    df.createOrReplaceTempView("sampling_flags")
    val viaSql = spark.sql(
      "SELECT observed_sampling_rate(sampled) AS r FROM sampling_flags")
      .as[Double].head()
    assert(viaSql === 0.6)
    val viaDs = df.as[Boolean]
      .select(udaf(Metrics.ObservedSamplingRate).apply(col("sampled")))
      .as[Double].head()
    assert(viaDs === 0.6)
    assert(Metrics.ObservedSamplingRate.finish(Metrics.ObservedSamplingRate.zero) === 0.0)
  }

  test("streaming listener captures per-batch throughput (A17)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val listener = new Metrics.ProgressListener
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Int]
      val q = input.toDF().writeStream.format("memory")
        .queryName("metrics_sink")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-metrics").toString)
        .start()
      input.addData(1 to 100: _*)
      q.processAllAvailable()
      q.stop()
      // listener events arrive on the async listener bus — poll with a
      // deadline instead of racing it, and sum across batches rather
      // than assuming the rows arrived as ONE micro-batch (under load
      // the engine may split them)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (listener.batches.map(_.numInputRows).sum < 100L &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.batches.map(_.numInputRows).sum === 100L,
        s"batches seen: ${listener.batches.map(_.numInputRows)}")
    } finally spark.streams.removeListener(listener)
  }

  test("keyed upsert: newest ts wins, updates win ties, replay is a no-op (A12 batch merge)") {
    val existing = Seq(
      ("k1", "v1", 100L), ("k2", "v2", 200L)).toDF("key", "value", "ts")
    val updates = Seq(
      ("k2", "v2-new", 300L), // newer → replaces
      ("k1", "v1-tie", 100L), // equal ts → update wins (replay contract)
      ("k3", "v3", 50L)) // new key → inserted
      .toDF("key", "value", "ts")
    val merged = WarehouseWriter.upsert(existing, updates, "key", "ts")
    val got = merged.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("k1", "v1-tie", 100L), ("k2", "v2-new", 300L), ("k3", "v3", 50L)))
    assert(merged.columns.toSeq === existing.columns.toSeq,
      "merge bookkeeping columns must not leak")
    // replaying the same updates against the merged state changes nothing
    val replay = WarehouseWriter.upsert(merged, updates, "key", "ts")
    assert(replay.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet === got)
  }

  test("warehouse layout: date partitions, clustered rows, retention drop (B6)") {
    val out = Files.createTempDirectory("graft-warehouse").toString
    val events = IngestPipeline.run(SyntheticData.envelopes(spark, 500), cfg).events
    WarehouseWriter.write(events, out)
    // partition directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("occurred_date=")).sorted
    assert(dirs.nonEmpty)
    // partition pruning: date predicate prunes the file index
    val pruned = WarehouseWriter.read(spark, out)
      .filter(col("occurred_date") === dirs.head.stripPrefix("occurred_date="))
    assert(pruned.count() > 0)
    // clustered: within each file, tenant_id runs are sorted
    val firstDate = dirs.head.stripPrefix("occurred_date=")
    val rows = WarehouseWriter.read(spark, out)
      .filter(col("occurred_date") === firstDate)
      .select("tenant_id").collect().map(_.getString(0))
    // retention: everything is 2024 → cutoff 2025 drops all partitions
    val dropped = WarehouseWriter.expirePartitions(spark, out,
      LocalDate.parse("2025-01-01"))
    assert(dropped.sorted === dirs.toSeq)
    assert(WarehouseWriter.expirePartitions(spark, out,
      LocalDate.parse("2025-01-01")).isEmpty)
  }

  test("compaction collapses streaming-append small files; data and other partitions untouched") {
    val out = Files.createTempDirectory("graft-compact").toString
    // 5 micro-batch appends → ≥5 files per partition (the streaming
    // sink's natural small-file accumulation)
    (1 to 5).foreach { i =>
      val ev = IngestPipeline.run(SyntheticData.envelopes(spark, 200, seed = i), cfg).events
      WarehouseWriter.write(ev, out)
    }
    val before = WarehouseWriter.fileReport(spark, out)
    assert(before.nonEmpty && before.forall(_._2 >= 5),
      s"each partition must hold ≥5 append files: $before")
    val all = WarehouseWriter.read(spark, out)
    val beforeRows = all.collect().map(_.toString).sorted
    // compact the FIRST partition only
    val target = before.head._1
    val res = WarehouseWriter.compactPartitions(spark, out, Seq(target),
      targetFileBytes = Long.MaxValue)
    assert(res.map(_._1) === Seq(target))
    assert(res.head._3 === 1,
      s"tiny partition must compact to ONE file, got ${res.head._3}")
    assert(res.head._2 >= 5)
    val after = WarehouseWriter.fileReport(spark, out)
    // untouched partitions keep their file counts
    assert(after.filter(_._1 != target) === before.filter(_._1 != target))
    // the data is byte-for-byte the same rows
    val afterRows = WarehouseWriter.read(spark, out)
      .collect().map(_.toString).sorted
    assert(afterRows.toSeq === beforeRows.toSeq)
    // the backup swap leaves no tmp/backup directories behind
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("."))
    assert(leftovers.isEmpty, s"compaction leftovers: ${leftovers.toSeq}")
  }

  test("random projection: exact integer output, JL norm concentration") {
    import org.apache.spark.sql.functions._
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val proj = graft.operators.Similarity
      .randomProjectionFixed(emb, outDims = 16, inDims = 64)
    // exact fixed-point: proj == proj_fp / 1e6 rounded
    val rows = proj.limit(200).collect()
    rows.foreach { r =>
      val fp = r.getAs[Long]("proj_fp")
      assert(r.getAs[Double]("proj") ===
        BigDecimal(fp / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    // JL property: E[||proj||^2] = outDims * ||x||^2 for ±1 rows; with
    // 16 rows the per-vector ratio concentrates — the AVERAGE over all
    // vectors must sit near 1 (loose 25% band; this is a sanity check
    // of the sign matrix, not a proof of the lemma)
    val ratio = proj
      .groupBy("vec_id")
      .agg(sum(col("proj_fp") * col("proj_fp")).as("p2"))
      .join(emb.select(col("vec_id"), aggregate(
        graft.operators.Similarity.scaledFixed(col("embedding")),
        lit(0L), (a, x) => a + x * x).as("x2")), "vec_id")
      .agg(avg(col("p2").cast("double") / (col("x2") * 16))).head().getDouble(0)
    assert(ratio > 0.75 && ratio < 1.25, s"JL ratio $ratio out of band")
  }

  test("PQ encoding: codebook vectors self-encode with zero error") {
    import org.apache.spark.sql.functions._
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val codes = graft.operators.Similarity
      .pqEncode(emb, m = 4, nCents = 16, inDims = 64)
    val self = codes.filter(col("vec_id") < 16).collect()
    assert(self.length === 16)
    self.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      (0 to 3).foreach { m =>
        assert(r.getAs[Long](s"code_$m") === id,
          s"vector $id must pick itself in subspace $m")
      }
      assert(r.getAs[Long]("qerr_fp") === 0L)
    }
    // non-codebook vectors: codes in range, error strictly positive
    // unless the vector duplicates a codebook entry
    val rest = codes.filter(col("vec_id") >= 16)
    assert(rest.filter(col("code_0") < 0 || col("code_0") >= 16 ||
      col("code_3") < 0 || col("code_3") >= 16).count() === 0)
    assert(rest.filter(col("qerr_fp") < 0).count() === 0)
  }

  test("upsert picks a deterministic winner among same-frame (key, ts) ties") {
    // Two rows in the SAME updates frame share (key, ts) but differ in
    // value — the content-hash tie-break must pick the same winner on
    // every run, whatever the input order or partitioning.
    val existing = Seq(("k1", "old", 10L)).toDF("key", "value", "ts")
    val dupA = Seq(("k1", "alpha", 100L), ("k1", "beta", 100L))
    def winner(rows: Seq[(String, String, Long)], parts: Int): String =
      WarehouseWriter.upsert(existing,
          rows.toDF("key", "value", "ts").repartition(parts), "key", "ts")
        .collect().map(r => r.getString(1)).head
    val first = winner(dupA, 1)
    assert(winner(dupA.reverse, 1) === first, "input order changed the winner")
    assert(winner(dupA, 7) === first, "partitioning changed the winner")
    assert(winner(dupA.reverse, 3) === first)
    // replay of the merged state stays a no-op
    val merged = WarehouseWriter.upsert(existing,
      dupA.toDF("key", "value", "ts"), "key", "ts")
    val replay = WarehouseWriter.upsert(merged,
      dupA.toDF("key", "value", "ts"), "key", "ts")
    assert(replay.collect().map(_.toString).sorted.toSeq ===
      merged.collect().map(_.toString).sorted.toSeq)
  }
}
