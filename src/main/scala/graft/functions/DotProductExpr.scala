package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`
  * fused into one codegen'd loop over the two ArrayData buffers.
  *
  * The higher-order formulation evaluates an interpreted lambda per
  * element and materializes the zipped products array per ROW — on the
  * similarity hot paths (q27 brute-force join, q48/q83 centroid
  * assignment, q71 cohesion) that is |pairs|·dim lambda frames and one
  * throwaway array per pair. This loop reads both buffers directly,
  * allocation-free, inside whole-stage codegen.
  *
  * Bit-identical to the HOF form: the sum is the same left-to-right
  * fold from 0.0 (`((0.0 + a0·b0) + a1·b1) + …`), so every consumer's
  * oracle hash is unchanged.
  *
  * CONTRACT (caller-enforced): equal-length arrays, no null elements.
  * Unequal lengths fold over the shorter prefix, they do not error.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def fits(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (fits(left.dataType) && fits(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> children, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Static helper (called from generated Java). */
object DotProduct {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
