package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryRegistry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full engine surface (SURVEY §2C inventory, one entry
  * per operator); `oracleSql` carries the DuckDB twin for every SQL-
  * expressible query. Implementations live in graft.queries.*.
  */
object SparkEntry {

  /** Flagship query on sf0.001 (Q6 — the reference's own canonical
    * verification query, load-test.js:135); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.byName("q06_counts_by_user_type")
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    QueryRegistry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
