package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{IngestPipeline, SyntheticData}
import graft.operators.WarehouseWriter

/** Crash-injection for the compaction swap (round-12 VERDICT ask #7):
  * [[WarehouseWriter.compactPartitions]] is killed — via the real code
  * path's injected-crash hook, not a filesystem simulation — at EVERY
  * rename boundary of the temp→bak→src swap, and after
  * [[WarehouseWriter.recoverPartitions]] (which every writer open runs
  * automatically) the directory must read back exactly the original
  * rows with zero dot-hidden debris. The three boundaries:
  *
  *   1. temp written, swap not begun (src intact, orphan temp)
  *   2. mid-swap: src renamed to bak, temp not yet promoted — the one
  *      window where a reader LOSES the partition
  *   3. swap committed, backup not yet dropped (src is compacted data)
  */
class WarehouseCrashRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val cfg = IngestPipeline.Config()

  private def buildWarehouse(): (String, Seq[String], String) = {
    val out = Files.createTempDirectory("graft-crash").toString
    (1 to 3).foreach { i =>
      val ev = IngestPipeline
        .run(SyntheticData.envelopes(spark, 200, seed = i), cfg).events
      WarehouseWriter.write(ev, out)
    }
    val rows = WarehouseWriter.read(spark, out)
      .collect().map(_.toString).sorted.toSeq
    val target = WarehouseWriter.fileReport(spark, out).head._1
    (out, rows, target)
  }

  private def hidden(out: String): Seq[String] =
    new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith(".")).toSeq

  private def readBack(out: String): Seq[String] =
    WarehouseWriter.read(spark, out).collect().map(_.toString).sorted.toSeq

  for (boundary <- 1 to 3) {
    test(s"injected crash at rename boundary $boundary leaves readable data after recovery") {
      val (out, original, target) = buildWarehouse()
      val crash = intercept[WarehouseWriter.InjectedCrash] {
        WarehouseWriter.compactPartitions(spark, out, Seq(target),
          targetFileBytes = Long.MaxValue, crashAt = boundary)
      }
      assert(crash.point === boundary)
      // the crash left dot-hidden debris (and at boundary 2, a missing
      // partition) — recovery must repair it
      assert(hidden(out).nonEmpty, "crash left no debris to recover")
      if (boundary == 2)
        assert(!new java.io.File(out, target).exists(),
          "boundary 2 must be the src-missing window")
      val actions = WarehouseWriter.recoverPartitions(spark, out)
      assert(actions.nonEmpty, "recovery took no action on crash debris")
      assert(hidden(out).isEmpty, s"debris survived recovery: ${hidden(out)}")
      // every row reads back: boundaries 1-2 restore the ORIGINAL
      // layout; boundary 3 keeps the committed compacted layout — the
      // ROWS are identical in all three
      assert(readBack(out) === original)
      // recovery is idempotent
      assert(WarehouseWriter.recoverPartitions(spark, out).isEmpty)
      // and a subsequent clean compaction completes from any recovered state
      val res = WarehouseWriter.compactPartitions(spark, out, Seq(target),
        targetFileBytes = Long.MaxValue)
      assert(res.nonEmpty && res.head._3 === 1)
      assert(readBack(out) === original)
      assert(hidden(out).isEmpty)
    }
  }

  test("writer open auto-recovers a mid-swap crash before appending") {
    val (out, original, target) = buildWarehouse()
    intercept[WarehouseWriter.InjectedCrash] {
      WarehouseWriter.compactPartitions(spark, out, Seq(target),
        targetFileBytes = Long.MaxValue, crashAt = 2)
    }
    assert(!new java.io.File(out, target).exists())
    // write() opens with recoverPartitions: the lost partition is
    // restored BEFORE the append lands beside it
    val ev = IngestPipeline
      .run(SyntheticData.envelopes(spark, 50, seed = 99), cfg).events
    WarehouseWriter.write(ev, out)
    assert(new java.io.File(out, target).exists(),
      "append did not restore the mid-swap-lost partition first")
    assert(hidden(out).isEmpty)
    val after = readBack(out)
    // all original rows survived alongside the appended batch
    assert(original.forall(after.contains))
    assert(after.length > original.length)
  }
}
