package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration of the engine's scalar functions, so `spark.sql`
  * users get the same surface as the DataFrame API:
  *
  *   normalize_phone(str)           — E.164 normalization (A8)
  *   deterministic_sample(key, r)   — reference sampling decision (A6)
  *   hash_bucket(key)               — the underlying [0,1] bucket
  *   hex_prefix_long(hex)           — native codegen'd hex prefix parse
  *   morton_code(x, y)              — 16-bit Z-order interleave (layout keys)
  *
  * All are pure Catalyst expression trees (no UDF barrier): the SQL form
  * plans identically to the DataFrame form.
  */
object EngineFunctions {

  private def col(e: Expression) = GraftColumnBridge.column(e)

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("normalize_phone",
      exprs => GraftColumnBridge.expression(
        CoreFunctions.normalizePhone(col(exprs.head))), "scala_udf")
    registry.createOrReplaceTempFunction("hash_bucket",
      exprs => GraftColumnBridge.expression(
        CoreFunctions.hashBucket(col(exprs.head))), "scala_udf")
    registry.createOrReplaceTempFunction("deterministic_sample",
      exprs => GraftColumnBridge.expression(
        CoreFunctions.hashBucket(col(exprs.head)) <
          col(exprs(1)).cast("double")), "scala_udf")
    registry.createOrReplaceTempFunction("hex_prefix_long",
      exprs => HexPrefixToLongExpr(exprs.head, 8), "scala_udf")
    registry.createOrReplaceTempFunction("morton_code",
      exprs => GraftColumnBridge.expression(
        MortonCode(col(exprs.head), col(exprs(1)), 8)), "scala_udf")
  }
}
