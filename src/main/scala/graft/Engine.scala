package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table access layer.
  *
  * All readers return plain DataFrames over the driver-generated parquet
  * star schema (TESTDATA.md): region, nation, customer, supplier, part,
  * orders, lineitem, events, documents, embeddings.
  *
  * The `events` table carries a parquet TIMESTAMP(NANOS) column that
  * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it
  * as a raw long (spark.sql.legacy.parquet.nanosAsLong) and surface a
  * microsecond-precision TIMESTAMP `ts` via integer division — exactly
  * what DuckDB 1.x surfaces for the same file (it truncates ns → us on
  * read), so oracle comparisons line up bit-for-bit.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Events stream table with `ts` truncated ns → us (DuckDB-equivalent). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timestamp_ntz keeps parquet output isAdjustedToUTC=false, the same
    // physical annotation DuckDB writes/reads — so oracle compares line up.
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
