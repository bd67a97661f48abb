package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CoreFunctions._
import graft.functions.HexParse

class HexPrefixExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native hex_prefix_long equals the conv(substring) composition") {
    val df = (1 to 500).map(i => s"key-$i").toDF("key")
      .select(sha2(col("key"), 256).as("h"))
      .select(col("h"),
        hexPrefixToLong(col("h")).as("native8"),
        conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("builtin8"),
        hexPrefixToLong15(col("h")).as("native15"),
        conv(substring(col("h"), 1, 15), 16, 10).cast("long").as("builtin15"))
    assert(df.filter(col("native8") =!= col("builtin8")).count() === 0)
    assert(df.filter(col("native15") =!= col("builtin15")).count() === 0)
  }

  test("handles short input, case, and rejects non-hex") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(HexParse.parsePrefix(UTF8String.fromString("ff"), 8) === 255L)
    assert(HexParse.parsePrefix(UTF8String.fromString("FF"), 8) === 255L)
    assert(HexParse.parsePrefix(UTF8String.fromString("deadbeef01"), 8) === 0xdeadbeefL)
    intercept[IllegalArgumentException] {
      HexParse.parsePrefix(UTF8String.fromString("xyz"), 8)
    }
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(100)
      .select(hexPrefixToLong(sha2(col("id").cast("string"), 256)).as("v"))
    // "*(n)" marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hex_prefix_long"), plan)
    assert(df.distinct().count() === 100)
    // and the codegen'd evaluation agrees with the builtin composition
    val both = spark.range(100)
      .select(hexPrefixToLong(sha2(col("id").cast("string"), 256)).as("a"),
        conv(substring(sha2(col("id").cast("string"), 256), 1, 8), 16, 10)
          .cast("long").as("b"))
    assert(both.filter(col("a") =!= col("b")).count() === 0)
  }
}
