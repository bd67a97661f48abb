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
  * CONTRACT: no null elements (the HOF form would return NULL; reading
  * a null slot here is undefined — arrays with containsNull should take
  * the HOF path). Unequal lengths THROW: the HOF form returns NULL
  * there, and a general-purpose helper silently folding the shorter
  * prefix would hand a malformed embeddings row a plausible score
  * instead of failing loudly.
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
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array length mismatch ($n vs ${b.numElements()}) — " +
          "malformed embedding row")
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
