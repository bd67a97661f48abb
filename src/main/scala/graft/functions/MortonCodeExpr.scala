package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative integer columns:
  * bit i of `left` lands at output bit 2i, bit i of `right` at 2i+1,
  * for the low `bits` bits of each input (bits ≤ 31, output ≤ 62 bits).
  *
  * The multi-dimensional clustering key behind Z-ordered table layout
  * (q219's audit): rows sorted by Morton code keep BOTH dimensions'
  * min/max zones tight, so file skipping works for either predicate.
  * A 16-term shift-and-mask SQL expression computes the same thing but
  * allocates a 33-node tree per column pair; this native expression is
  * one codegen'd static call — constant-folded, whole-stage friendly,
  * allocation-free. The magic-constant spread implementation is the
  * standard public-domain "interleave by binary magic numbers"
  * bit-twiddling pattern.
  */
case class MortonCodeExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be 1..31")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Morton.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.Morton.interleave($l, $r, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCodeExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "morton_code"
}

/** Static helper (called from generated Java). */
object Morton {
  /** Spread the low 31 bits of v so bit i moves to bit 2i. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    require(x >= 0 && y >= 0 && x <= mask && y <= mask,
      s"morton_code: inputs must be in [0, 2^$bits): got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }
}

object MortonCode {
  /** Column API: morton(x, y, bits). Children are cast to LONG up
    * front — the expression itself is Long-only (AbstractDataType is
    * private[sql] in Spark 4, so the implicit-cast trait is not
    * available to external expressions). */
  def apply(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(MortonCodeExpr(
      GraftColumnBridge.expression(x.cast("long")),
      GraftColumnBridge.expression(y.cast("long")),
      bits))
}
