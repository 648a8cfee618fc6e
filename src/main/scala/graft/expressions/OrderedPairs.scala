package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (ds[i], ds[j]) with i < j from a sorted ARRAY<BIGINT> —
  * the candidate-pair fan-out step of shingle-keyed similarity joins
  * (`Dedup.jaccardPairs`). One compiled O(n²) loop over primitive longs; the
  * HOF formulation (`transform` + per-element `slice` + struct lambda) does
  * the same work interpreted, with an array copy per element.
  *
  * Elements must be non-null; the caller sorts (so a < b holds pairwise when
  * the input is ascending).
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ordered_pairs requires ARRAY<BIGINT>, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val ds = input.asInstanceOf[ArrayData]
    val n = ds.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = ds.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = InternalRow(a, ds.getLong(j))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  def apply(ds: Column): Column =
    GraftBridge.column(OrderedPairs(GraftBridge.expression(ds)))
}
