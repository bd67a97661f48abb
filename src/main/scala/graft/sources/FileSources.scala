package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-based bootstrap sources with per-row error routing: the batch
  * twin of the streaming push ingest (reference `handler.js:43-44` routes
  * undecodable messages to the DLQ instead of failing the batch — a file
  * load must do the same, not die on row 1 of a 100 TB backfill).
  *
  * Both readers return a (good, dlq) pair: `good` carries the typed
  * columns of `schema`; `dlq` carries the raw line/record plus an
  * `error_type` tag matching the ingest taxonomy (`invalid_json` /
  * `missing_fields`, CoreFunctions.categorizeError's vocabulary).
  *
  * Scale notes: both paths are single-pass scans — the split is two
  * filters over one cached-free projection, so Spark reads each file
  * once per consumed branch with full predicate/column pushdown into the
  * text scan. No driver-side parsing, no `collect()`.
  */
object FileSources {

  /** Read newline-delimited JSON with explicit schema. Rows that fail to
    * parse land in the DLQ frame with `error_type = invalid_json`; rows
    * that parse but miss any of `requiredFields` land there as
    * `missing_fields`. Parsing is `from_json` over `spark.read.text` —
    * NOT `spark.read.json` — so a malformed line can never poison schema
    * inference, and the raw line survives for replay.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String] = Nil): (DataFrame, DataFrame) = {
    // from_json in PERMISSIVE mode null-FILLS a malformed line's fields
    // rather than nulling the struct, so corrupt detection needs the
    // corrupt-record column declared inside the parse schema
    val corrupt = "__corrupt_record"
    val withCorrupt = schema.add(corrupt, "string")
    val parsed = spark.read.text(path)
      .withColumn("parsed", from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corrupt)))
    val bad = parsed.filter(col(s"parsed.$corrupt").isNotNull)
      .select(col("value").as("raw"), lit("invalid_json").as("error_type"))
    val fields = parsed.filter(col(s"parsed.$corrupt").isNull)
      .select(col("value").as("raw"), col("parsed.*"))
      .drop(corrupt)
    val (good, missing) = splitRequired(fields, requiredFields)
    (good.drop("raw"), bad.unionByName(missing))
  }

  /** Read CSV with explicit schema and a header row. Malformed rows are
    * captured via Spark's PERMISSIVE corrupt-record column (the raw
    * record survives for replay) and routed as `invalid_csv`; parsed rows
    * missing `requiredFields` route as `missing_fields`. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      requiredFields: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val corrupt = "__corrupt_record"
    val withCorrupt = schema.add(corrupt, "string")
    val parsed = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(withCorrupt)
      .csv(path)
      // columns referenced alongside the corrupt-record column must be
      // materialized from the same pass
      .cache()
    val bad = parsed.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw"), lit("invalid_csv").as("error_type"))
    val fields = parsed.filter(col(corrupt).isNull).drop(corrupt)
      .withColumn("raw", lit(null).cast("string"))
    val (good, missing) = splitRequired(fields, requiredFields)
    (good.drop("raw"), bad.unionByName(missing))
  }

  /** Split a parsed frame on required-field presence; the failing branch
    * carries (raw, error_type = missing_fields). */
  private def splitRequired(fields: DataFrame, requiredFields: Seq[String])
      : (DataFrame, DataFrame) =
    if (requiredFields.isEmpty)
      (fields, fields.limit(0)
        .select(col("raw"), lit("missing_fields").as("error_type")))
    else {
      val ok = requiredFields.map(col(_).isNotNull).reduce(_ && _)
      (fields.filter(ok),
        fields.filter(!ok)
          .select(col("raw"), lit("missing_fields").as("error_type")))
    }
}
