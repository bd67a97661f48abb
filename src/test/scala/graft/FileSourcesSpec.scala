package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FileSources

class FileSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("graft-src").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, s"part-0.$suffix")
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    f.getAbsolutePath
  }

  test("jsonl: corrupt lines and missing required fields route to DLQ, not failure") {
    val path = write(Seq(
      """{"id": 1, "name": "a", "score": 0.5}""",
      """{"id": 2, "name": "b"}""", // missing optional score → still good
      """{"id": 3, "score": 0.7}""", // missing REQUIRED name → DLQ
      """not json at all{{{""", // corrupt → DLQ
      """{"id": 4, "name": "d", "score": 1.0}"""), "jsonl")
    val (good, dlq) = FileSources.jsonl(spark, path, schema,
      requiredFields = Seq("id", "name"))
    val g = good.collect()
    assert(g.length === 3)
    assert(g.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 4L))
    // the schema is the declared one, raw line dropped from the good side
    assert(good.columns.toSeq === Seq("id", "name", "score"))
    val d = dlq.collect().map(r => (r.getString(0), r.getString(1)))
    assert(d.length === 2)
    assert(d.count(_._2 == "invalid_json") === 1)
    assert(d.count(_._2 == "missing_fields") === 1)
    // the raw line survives for replay
    assert(d.exists(_._1.contains("not json")))
    assert(d.exists(_._1.contains("\"id\": 3")))
  }

  test("csv: malformed rows captured via PERMISSIVE corrupt record; required fields enforced") {
    val path = write(Seq(
      "id,name,score",
      "1,a,0.5",
      "oops,b,not-a-number", // type mismatch → corrupt
      "3,,0.7", // empty REQUIRED name → DLQ missing_fields
      "4,d,1.0"), "csv")
    val (good, dlq) = FileSources.csv(spark, path, schema,
      requiredFields = Seq("id", "name"))
    val g = good.collect()
    assert(g.map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))
    assert(good.columns.toSeq === Seq("id", "name", "score"))
    val d = dlq.collect().map(r => (r.getString(0), r.getString(1)))
    assert(d.count(_._2 == "invalid_csv") === 1)
    assert(d.count(_._2 == "missing_fields") === 1)
    // the corrupt branch preserves the raw record for replay
    assert(d.exists(t => t._2 == "invalid_csv" && t._1.contains("oops")))
  }

  test("jsonl with no required fields: every parseable row is good") {
    val path = write(Seq("""{"id": 1}""", "garbage"), "jsonl")
    val (good, dlq) = FileSources.jsonl(spark, path, schema)
    assert(good.count() === 1)
    val d = dlq.collect()
    assert(d.length === 1 && d.head.getString(1) === "invalid_json")
  }
}
