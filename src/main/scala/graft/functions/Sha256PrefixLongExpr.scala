package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused `hex_prefix_long(sha2(s, 256), nHex)`: SHA-256 the UTF8 bytes of
  * a string column and return the first `nHex` hex characters as a Long —
  * without materializing the 64-char hex string in between.
  *
  * The built-in `sha2` (commons-codec) allocates a fresh MessageDigest
  * via provider lookup per row, converts the 32-byte digest to a 64-char
  * hex String, which [[HexPrefixToLongExpr]] then re-parses. This sits on
  * the hottest loops of the engine — one hash per shingle for MinHash
  * (millions of rows), per token for SimHash, per key for deterministic
  * sampling — so the fused form reuses a thread-local digest and reads
  * the prefix straight out of the digest bytes: first nHex·4 bits of the
  * digest, big-endian, exactly the value of parsing the first nHex hex
  * chars (bit-identical to the unfused chain and to the DuckDB twin
  * `CAST('0x' || substr(sha256(s), 1, nHex) AS BIGINT)`).
  */
case class Sha256PrefixLongExpr(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15,
    "nHex must fit a positive signed long (1..15 hex chars)")

  // Analysis-time input typing (ExpectsInputTypes' AbstractDataType is
  // private[sql], so the check is spelled out): a non-string child must
  // fail resolution like the sha2(...) chain this expression replaced,
  // not surface as a runtime ClassCastException or codegen compile error.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Sha256Prefix.prefixLong(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Sha256Prefix.prefixLong($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression)
      : Sha256PrefixLongExpr = copy(child = newChild)

  override def prettyName: String = "sha256_prefix_long"
}

/** Static helper (called from generated Java). */
object Sha256Prefix {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  def prefixLong(s: UTF8String, nHex: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first nHex hex chars == first nHex*4 bits of the digest, big-endian
    val nBytes = (nHex + 1) / 2
    var acc = 0L
    var i = 0
    while (i < nBytes) {
      acc = (acc << 8) | (d(i) & 0xffL)
      i += 1
    }
    if (nHex % 2 == 1) acc >>>= 4
    acc
  }
}
