package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Morton, MortonCode}

/** Native Z-order interleave: bit-exact vs the unrolled shift-and-mask
  * SQL form (the q219 oracle's formulation), codegen-friendly, and
  * range-guarded. */
class MortonCodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scalar helper interleaves bits (known vectors)") {
    assert(Morton.interleave(0L, 0L, 8) == 0L)
    assert(Morton.interleave(1L, 0L, 8) == 1L)   // x bit 0 → out bit 0
    assert(Morton.interleave(0L, 1L, 8) == 2L)   // y bit 0 → out bit 1
    assert(Morton.interleave(255L, 0L, 8) == 0x5555L)
    assert(Morton.interleave(0L, 255L, 8) == 0xaaaaL)
    assert(Morton.interleave(255L, 255L, 8) == 0xffffL)
    // 31-bit extremes stay positive in the 62-bit output
    assert(Morton.interleave((1L << 31) - 1, (1L << 31) - 1, 31) ==
      (1L << 62) - 1)
  }

  test("column expression matches the unrolled shift-and-mask SQL on a sweep") {
    import spark.implicits._
    val df = spark.range(4096)
      .select((col("id") % 256).as("x"), (col("id") / 16 % 256).as("y"))
    val unrolled = (0 until 8).map { i =>
      s"(shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1}))"
    }.mkString(" + ")
    val bad = df.select(MortonCode(col("x"), col("y"), 8).as("native"),
        expr(unrolled).as("reference"))
      .filter(col("native") =!= col("reference")).count()
    assert(bad == 0L)
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.range(16).select(
      MortonCode(col("id"), col("id"), 8).as("z"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [morton_code"),
      s"morton_code must not break codegen:\n$plan")
  }

  test("out-of-range input throws instead of silently truncating") {
    intercept[IllegalArgumentException](Morton.interleave(256L, 0L, 8))
    intercept[IllegalArgumentException](Morton.interleave(-1L, 0L, 8))
  }

  test("SQL registration: morton_code callable from spark.sql") {
    graft.functions.EngineFunctions.registerAll(spark)
    val row = spark.sql("SELECT morton_code(255L, 0L) AS z").collect().head
    assert(row.getLong(0) == 0x5555L)
  }

  test("SQL registration casts INT arguments (interpreted eval too)") {
    graft.functions.EngineFunctions.registerAll(spark)
    // INT literals: the registration must cast to LONG like the Column
    // API does, or interpreted eval throws ClassCastException
    val row = spark.sql("SELECT morton_code(255, 0) AS z").collect().head
    assert(row.getLong(0) == 0x5555L)
    // and over a real column of ints
    import spark.implicits._
    val got = Seq(3, 5).toDF("x").createOrReplaceTempView("mc_ints")
    val vals = spark.sql("SELECT morton_code(x, x) AS z FROM mc_ints ORDER BY z")
      .collect().map(_.getLong(0))
    assert(vals.sameElements(Array(Morton.interleave(3L, 3L, 8),
      Morton.interleave(5L, 5L, 8)).sorted))
  }
}
