package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY §3.3): registers the test-data star schema as
  * temp views so the full Catalyst path — parse → analyze → optimize →
  * execute — is first-class: `spark.sql("SELECT ... FROM lineitem ...")`.
  */
object Catalog {

  val tableNames: Seq[String] = Tables.starTables :+ "events"

  /** Register every table under `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Convenience: register + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
