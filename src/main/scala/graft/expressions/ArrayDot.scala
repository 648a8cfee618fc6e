package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two ARRAY<DOUBLE> columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is a higher-order function, which Catalyst evaluates interpreted (per
  * element: lambda-variable binding + boxing). For ANN scoring that fold IS
  * the inner loop, so this expression provides the same left-to-right f64
  * accumulation as a tight codegen'd Java loop (with an interpreted
  * fallback). Same fold order ⇒ bit-identical results to the HOF version
  * and to the DuckDB oracle's list_dot_product.
  *
  * Array elements must be non-null (embedding vectors); lengths are
  * truncated to the shorter operand, matching zip_with-without-padding use.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot requires ARRAY<DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  import org.apache.spark.sql.GraftBridge
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
