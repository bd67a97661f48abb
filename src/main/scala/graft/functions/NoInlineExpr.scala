package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that stops the optimizer from re-inlining an
  * expensive derived column.
  *
  * Catalyst's `PushPredicateThroughNonJoin` substitutes project aliases
  * into pushed-down predicates with no cost model: a filter on a column
  * derived from an expensive tree (base64-decode → JSON extraction →
  * sha256 sampling, as in the ingest pipeline) gets every alias reference
  * replaced by a full copy of that tree. The pipeline's validity filter
  * references derived columns ~12×, so the pushed predicate re-embeds the
  * whole decode tree 12× — recomputing it per reference at runtime and
  * inflating the fused whole-stage-codegen method past the JVM's 64 KB
  * limit (a silent fall-back off codegen for the hot ingest stage).
  *
  * Both pushdown and `CollapseProject` only rewrite across projects whose
  * fields are all deterministic, so an identity expression that REPORTS
  * nondeterminism pins the column in place. The expression is in fact
  * pure — results, retries and re-runs are unaffected (the flag only
  * gates plan rewrites and forces whole-task retry, both safe here) — and
  * codegen passes straight through to the child, so the stage stays
  * compiled.
  *
  * Use on derived columns that (a) feed multiple downstream consumers or
  * filters and (b) can never become source-pushable scan predicates
  * anyway. Do NOT use on raw source columns: it would block legitimate
  * parquet filter pushdown. Side effect to plan around: the pushdown
  * rules test ALL fields of a Project, so one barrier column stops
  * predicates on its SIBLING pass-through columns from crossing that
  * Project too — apply filters on raw source columns BEFORE the
  * projection that introduces the barrier (as IngestPipeline documents
  * for `decoded`).
  */
case class NoInlineExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  /** Deliberately false — see class doc. The expression itself is pure. */
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): NoInlineExpr =
    copy(child = newChild)

  override def prettyName: String = "no_inline"
}
