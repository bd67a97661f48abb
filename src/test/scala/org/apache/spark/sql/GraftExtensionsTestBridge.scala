package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Test-only bridge into SparkSessionExtensions' private[sql] state:
  * lets the extensions spec verify what GraftExtensions injected
  * without building a second SparkContext (spark.sql.extensions is a
  * static conf — it cannot be applied to the already-running shared
  * test session). */
object GraftExtensionsTestBridge {
  def injectedFunctions(ext: SparkSessionExtensions)
      : Seq[(FunctionIdentifier, Seq[Expression] => Expression)] = {
    val registry = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(registry)
    registry.listFunction().map { ident =>
      ident -> ((exprs: Seq[Expression]) =>
        registry.lookupFunction(ident, exprs))
    }
  }
}
