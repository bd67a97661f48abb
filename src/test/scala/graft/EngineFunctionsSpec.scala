package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EngineFunctions

class EngineFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("engine functions are callable from SQL and plan as pure expressions") {
    EngineFunctions.registerAll(spark)
    assert(spark.sql("SELECT normalize_phone('(415) 555-0001')")
      .head().getString(0) === "+14155550001")
    assert(spark.sql("SELECT normalize_phone('junk')").head().isNullAt(0))
    // bit-exact vs the pinned reference vector for 'call-123'
    assert(spark.sql("SELECT hex_prefix_long(sha2('call-123', 256))")
      .head().getLong(0) === 1814378258L)
    assert(spark.sql("SELECT hash_bucket('call-123')")
      .head().getDouble(0) === 0.4224428577400844)
    assert(spark.sql("SELECT deterministic_sample('call-123', 0.5)")
      .head().getBoolean(0))
    assert(!spark.sql("SELECT deterministic_sample('call-123', 0.25)")
      .head().getBoolean(0))
    // no UDF barrier: the SQL form stays an expression tree over a scan
    val plan = spark.range(10)
      .selectExpr("hash_bucket(cast(id as string)) AS b")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }
}
