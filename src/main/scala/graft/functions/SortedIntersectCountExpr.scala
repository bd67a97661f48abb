package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `size(array_intersect(a, b))` specialized for SORTED long arrays with
  * distinct elements: a two-pointer merge count.
  *
  * The built-in `array_intersect` builds a hash set from one side PER ROW
  * and materializes the intersection array only to take its size. On the
  * n-gram Jaccard hot path (q31) that is millions of candidate pairs ×
  * hundreds-of-element gram arrays — the per-row hash-set build and the
  * thrown-away output array are pure overhead when both sides are already
  * sorted and deduplicated (one `array_sort` over `collect_list` of a
  * per-doc `distinct`, amortized across every pair the doc appears in).
  * The merge scan is branch-light, allocation-free, and codegen'd.
  *
  * CONTRACT (caller-enforced, as with every *sorted* primitive): both
  * arrays ascending-sorted, elements distinct, no nulls. Violations
  * return a smaller count, they do not error.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(LongType, containsNull = false)
    def fits(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (fits(left.dataType) && fits(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ${ok.sql} children, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersect.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** Static helper (called from generated Java). */
object SortedIntersect {
  def count(a: ArrayData, b: ArrayData): Int = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
