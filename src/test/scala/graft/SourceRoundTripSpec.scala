package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format surface: every file format the engine can write
  * must round-trip the events table LOSSLESSLY (read-back row-identical
  * to the source frame) — parquet and ORC natively typed, JSONL and CSV
  * re-read under the explicit schema (the FileSources discipline: never
  * infer). A format that silently truncates timestamps, mangles quoted
  * JSON payloads, or flips a double would corrupt every 100 TB backfill
  * that passes through it — this is the proof none does. */
class SourceRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // a deterministic slice with the risky shapes: JSON-with-commas in
  // props (CSV quoting), sub-second timestamps, negative/long ids
  private lazy val events: DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001").limit(2000).cache()

  private def assertSame(back: DataFrame, label: String): Unit = {
    val a = events
    assert(back.schema == a.schema,
      s"$label schema drift: ${back.schema.treeString}")
    val missing = a.exceptAll(back).count()
    val extra = back.exceptAll(a).count()
    assert(missing == 0 && extra == 0,
      s"$label round trip lost $missing rows, invented $extra")
  }

  test("parquet round trip is lossless") {
    val dir = s"/tmp/graft_rt_parquet_${System.nanoTime()}"
    events.write.mode("overwrite").parquet(dir)
    assertSame(spark.read.parquet(dir), "parquet")
  }

  test("orc round trip is lossless") {
    val dir = s"/tmp/graft_rt_orc_${System.nanoTime()}"
    events.write.mode("overwrite").orc(dir)
    assertSame(spark.read.orc(dir), "orc")
  }

  test("jsonl round trip is lossless under the explicit schema") {
    val dir = s"/tmp/graft_rt_json_${System.nanoTime()}"
    // ts is timestamp_ntz: the text writers take timestampNTZFormat
    // (NOT timestampFormat) for it, and the default truncates to
    // milliseconds — pin full microsecond precision so parse-back is
    // exact
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    events.write.mode("overwrite")
      .option("timestampNTZFormat", fmt).json(dir)
    assertSame(
      spark.read.schema(events.schema).option("timestampNTZFormat", fmt)
        .json(dir), "jsonl")
  }

  test("csv round trip is lossless under the explicit schema") {
    val dir = s"/tmp/graft_rt_csv_${System.nanoTime()}"
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    events.write.mode("overwrite")
      .option("header", "true").option("timestampNTZFormat", fmt)
      .option("escape", "\"").csv(dir)
    assertSame(
      spark.read.schema(events.schema)
        .option("header", "true").option("timestampNTZFormat", fmt)
        .option("escape", "\"").csv(dir), "csv")
  }
}
