package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer barrier for EXPENSIVE projection expressions: a transparent
  * pass-through that reports `deterministic = false`, so Catalyst will not
  * duplicate, push filters through, or collapse projections over the
  * wrapped expression (guide §4.4 — the `asNondeterministic()` idiom for
  * expensive UDFs, applied to native expressions).
  *
  * The hazard this closes: `InferFiltersFromGenerate` infers
  * `size(arr) > 0 AND isnotnull(arr)` under every `explode(arr)`, and
  * predicate pushdown then substitutes the PRODUCING expression into the
  * filter — a CodegenFallback expression like `winnow_hashes` (no
  * common-subexpression elimination) ends up evaluated 2–3× per input row:
  * once per filter conjunct plus once in the projection (measured in the
  * committed d44 r16 plan). Wrapping the projection alias in `eval_once`
  * keeps the inferred filter ABOVE the projection, referencing the
  * attribute — one evaluation per row.
  *
  * The wrapped expression MUST be genuinely deterministic (the flag is a
  * fence against plan surgery, not a semantics change): results are
  * identical, only evaluation count moves. Codegen delegates verbatim to
  * the child.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnce {
  def apply(c: Column): Column =
    GraftBridge.column(EvalOnce(GraftBridge.expression(c)))
}
