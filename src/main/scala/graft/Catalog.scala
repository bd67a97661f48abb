package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY §3.3): registers the test-data star schema as
  * temp views so the full Catalyst path — parse → analyze → optimize →
  * execute — is first-class: `spark.sql("SELECT ... FROM lineitem ...")`.
  */
object Catalog {

  val tableNames: Seq[String] = Tables.starTables :+ "events"

  /** Last dir registered per session: re-registering the same dir is a
    * no-op (the temp views would be replaced with identical plans —
    * ~70 ms of catalog writes per call, paid by every SQL-entry query
    * per bench pass). A DIFFERENT dir re-registers everything. Weak
    * keys so short-lived test sessions do not accumulate. */
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Register every table under `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.get(spark) != dir) {
        tableNames.foreach { t =>
          Tables.table(spark, dir, t).createOrReplaceTempView(t)
        }
        registeredDir.put(spark, dir)
      }
    }

  /** Convenience: register + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
