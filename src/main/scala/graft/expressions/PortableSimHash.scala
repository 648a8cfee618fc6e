package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash over word md5s — semantically identical to the
  * engine-portable Column formulation (word → md5 hex; bit j drawn from
  * nibble j/4, bit j%4; ±1 votes; sign → signature bit), but the vote loop
  * runs as compiled Scala instead of ~60×|words| interpreted lambda
  * evaluations per row (~200× faster per document, measured).
  *
  * Bit mapping mirrors hex-string indexing: 0-based hex char k is the high
  * nibble of digest byte k/2 when k is even, low nibble when odd — so the
  * DuckDB oracle's substr(md5(w), j//4+1, 1) replay matches bit-for-bit.
  */
case class PortableSimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"portable_simhash requires ARRAY<STRING>, got $other")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var w = 0
    while (w < words.numElements()) {
      val word = words.getUTF8String(w)
      if (word != null) {
        md.reset()
        val digest = md.digest(word.getBytes)
        var j = 0
        while (j < bits) {
          val k = j / 4 // 0-based hex char index
          val nibble =
            if ((k & 1) == 0) (digest(k / 2) >>> 4) & 0xf
            else digest(k / 2) & 0xf
          if (((nibble >> (j % 4)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      w += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
    copy(child = newChild)
}

object PortableSimHash {
  def apply(ws: Column, bits: Int = 60): Column =
    GraftBridge.column(PortableSimHash(GraftBridge.expression(ws), bits))
}
