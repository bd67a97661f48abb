package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-deployable installer for the engine's SQL surface:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * injects every engine scalar function into the session's function
  * registry at session build — the idiomatic way to ship the engine to
  * a 1000-executor cluster (or a Thrift/Connect server), where no
  * driver-side `EngineFunctions.registerAll(spark)` call runs: every
  * session, including ones the application code never touches, gets
  * `normalize_phone`, `deterministic_sample`, `hash_bucket`,
  * `hex_prefix_long` and `morton_code` in plain `spark.sql` text.
  *
  * The function builders are shared with
  * [[graft.functions.EngineFunctions]] (the same expression trees, so
  * the SQL form plans identically to the DataFrame form); this class
  * only adapts them to the injectFunction contract.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.EngineFunctions.builders.foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.EngineFunctions", name),
          builder))
    }
}
