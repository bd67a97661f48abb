package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{Item, TopHits}

class StreamingHeavyHittersSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  test("frequent items survive across micro-batches within the MG bound") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Item]
    val out = StreamingHeavyHitters.monitor(input.toDS(), k = 3, topN = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hh_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hh").toString)
      .start()
    // batch 1: "hot" appears 10×, noise a/b once each
    val b1 = (0 until 10).map(i => Item(i, "t1", "hot")) ++
      Seq(Item(10, "t1", "a"), Item(11, "t1", "b"))
    input.addData(b1: _*)
    q.processAllAvailable()
    // batch 2: "warm" appears 6×, more noise — state carries "hot"
    val b2 = (20 until 26).map(i => Item(i, "t1", "warm")) ++
      Seq(Item(26, "t1", "c"), Item(27, "t1", "d"))
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hh_out").as[TopHits].collect()
      .sortBy(_.n_items)
    assert(got.length === 2)
    // after batch 1: hot dominates with a count within the MG bound
    assert(got(0).top.head === "hot")
    assert(got(0).min_counts.head >= 10L - 12L / 4) // n/(k+1) slack
    // after batch 2 (n=20): both heavy items present, hot still first
    assert(got(1).n_items === 20L)
    assert(got(1).top.toSet === Set("hot", "warm"))
    // every emitted count is a LOWER bound on the true count
    assert(got(1).min_counts.head <= 10L && got(1).min_counts(1) <= 6L)
  }

  test("streamed single-batch top matches the batch aggregator's top item") {
    implicit val sqlCtx = spark.sqlContext
    val items = Seq.tabulate(30)(i =>
      Item(i, "g", if (i % 3 == 0) "x" else s"noise$i"))
    val batchTop = items.map(_.item).toDS()
      .select(graft.operators.HeavyHitters.sketch(8).toColumn)
      .head().head.item
    val input = MemoryStream[Item]
    val out = StreamingHeavyHitters.monitor(input.toDS(), k = 8, topN = 1)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hh_eq_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-hh2").toString)
      .start()
    input.addData(items: _*)
    q.processAllAvailable()
    q.stop()
    val streamedTop = spark.table("hh_eq_out").as[TopHits]
      .collect().head.top.head
    assert(streamedTop === batchTop && streamedTop === "x")
  }
}
