package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ⇄ Expression converters — Spark 4
  * removed the public `Column.expr` / `new Column(expr)` surface; custom
  * Catalyst expressions (graft.functions.HexPrefixToLongExpr) still need
  * the classic conversion. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager ColumnNode → catalyst conversion: ExpressionUtils.expression
    * wraps lazily in a ColumnNodeExpression, which never resolves when
    * the result is injected through the function registry — the converter
    * produces a plain catalyst tree the analyzer handles anywhere. */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
