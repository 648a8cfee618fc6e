package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-shingling: `out[i] = ws[i] ⧺ " " ⧺ … ⧺ ws[i+k-1]` for
  * i in [0, n-k], empty array when the document has fewer than k words —
  * exactly the strings the sliding-zip HOF formulation
  * ([[graft.functions.TextFunctions.shinglesHof]]) and the DuckDB oracle's
  * `list_transform(range(...), i -> ws[i] || ' ' || …)` produce, but as one
  * compiled pass over UTF8String bytes instead of k−1 interpreted zip_with
  * lambdas with per-element array slicing.
  *
  * Word elements must be non-null (the `words()` splitter never yields
  * nulls). On inputs that DO contain null elements the parity with the HOF
  * form breaks by design: `UTF8String.concatWs` skips nulls (shingle "a b"
  * from `["a", null, "b"]`) where `shinglesHof`'s `concat` null-propagates
  * the whole shingle — callers feeding arbitrary arrays through the SQL
  * registration should `filter(x -> x IS NOT NULL)` first.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires ARRAY<STRING>, got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = ws.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(ws: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(ws), k))
}
