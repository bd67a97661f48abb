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

  /** Per-session reader cache: (dir, name) → analyzed DataFrame.
    *
    * `spark.read.parquet` pays a driver-side file listing plus a footer
    * schema read on EVERY call (~60–120 ms warm per table on this box).
    * The registry builds each table reference fresh inside every query
    * function, so one bench pass re-did that metadata work thousands of
    * times (Catalog.registerAll alone is 10 reads ≈ 0.75 s, paid by each
    * TPC-H-shape entry per pass — measured in DebugBuildCost). Caching
    * the ANALYZED PLAN (never data: no .persist here, every action still
    * scans parquet) is the file-listing remedy of guide §6, applied at
    * the driver.
    *
    * Contract: one data generation per (session, dir). The probe/test
    * tooling that rewrites a dir (GenScaleProbe, warehouse specs) runs
    * in its own JVM or reads via fresh `spark.read` calls; anything else
    * can call [[invalidate]] after an in-session rewrite. Keyed weakly
    * by session so short-lived test sessions do not accumulate. */
  private val readerCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]()

  private def cached(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = readerCache.synchronized {
    val m = {
      val existing = readerCache.get(spark)
      if (existing != null) existing
      else {
        val fresh = scala.collection.mutable.Map.empty[(String, String), DataFrame]
        readerCache.put(spark, fresh)
        fresh
      }
    }
    m.getOrElseUpdate((dir, name), build)
  }

  /** Drop cached readers (all sessions) for `dir` — call after rewriting
    * a directory that was already read through [[table]] in a live
    * session. */
  def invalidate(dir: String): Unit = readerCache.synchronized {
    readerCache.values.forEach(m =>
      m.keys.filter(_._1 == dir).toSeq.foreach(m.remove))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else cached(spark, dir, name)(spark.read.parquet(s"$dir/$name.parquet"))

  /** Events stream table with `ts` as microsecond TIMESTAMP_NTZ
    * (DuckDB-equivalent) regardless of the file's physical encoding. */
  def events(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "events") {
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
