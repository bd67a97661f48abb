package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table access layer.
  *
  * All readers return plain DataFrames over the driver-generated parquet
  * star schema (TESTDATA.md): region, nation, customer, supplier, part,
  * orders, lineitem, events, documents, embeddings.
  *
  * The `events` table's `ts` column has shipped in two physical parquet
  * encodings across driver testdata generations: TIMESTAMP(NANOS) (which
  * Spark's vectorized reader rejects — [PARQUET_TYPE_ILLEGAL] — so we
  * read it as a raw long via spark.sql.legacy.parquet.nanosAsLong and
  * divide to microseconds) and plain TIMESTAMP(MICROS). The reader
  * branches on the type it actually finds; both paths surface the same
  * microsecond-precision TIMESTAMP_NTZ `ts` that DuckDB 1.x sees for the
  * same file (it truncates ns → us on read), so oracle comparisons line
  * up bit-for-bit either way.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Events stream table with `ts` as microsecond TIMESTAMP_NTZ
    * (DuckDB-equivalent) regardless of the file's physical encoding. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timestamp_ntz keeps parquet output isAdjustedToUTC=false, the same
    // physical annotation DuckDB writes/reads — so oracle compares line up.
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // legacy TIMESTAMP(NANOS) file read as raw long: truncate ns → us
        raw.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
