package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parses the first `prefixLen` hex characters of a string column into a
  * Long, reading UTF8String bytes directly.
  *
  * Semantically identical to `conv(substring(col, 1, prefixLen), 16, 10)
  * .cast("long")` for valid lowercase/uppercase hex input (sha2 output),
  * but avoids two intermediate string allocations per row — this sits on
  * the hottest path of the engine (millions of shingle hashes per
  * MinHash/fingerprint pass), where the codegen'd byte loop keeps the
  * whole stage allocation-free.
  *
  * Full whole-stage-codegen support via a static helper call; invalid hex
  * input throws (callers feed sha2 hex exclusively).
  */
case class HexPrefixToLongExpr(child: Expression, prefixLen: Int)
    extends UnaryExpression {
  require(prefixLen >= 1 && prefixLen <= 15,
    "prefixLen must fit a positive signed long (1..15 hex chars)")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HexParse.parsePrefix(input.asInstanceOf[UTF8String], prefixLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HexParse.parsePrefix($c, $prefixLen)")

  override protected def withNewChildInternal(newChild: Expression)
      : HexPrefixToLongExpr = copy(child = newChild)

  override def prettyName: String = "hex_prefix_long"
}

/** Static helper (called from generated Java). */
object HexParse {
  def parsePrefix(s: UTF8String, prefixLen: Int): Long = {
    val n = math.min(s.numBytes(), prefixLen)
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val d =
        if (b >= '0' && b <= '9') b - '0'
        else if (b >= 'a' && b <= 'f') b - 'a' + 10
        else if (b >= 'A' && b <= 'F') b - 'A' + 10
        else throw new IllegalArgumentException(
          s"hex_prefix_long: non-hex byte $b in '${s.toString.take(32)}'")
      acc = (acc << 4) | d
      i += 1
    }
    acc
  }
}
