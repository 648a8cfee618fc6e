package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable MinHash signature: for hash index i in [0, k),
  * `sig_i = min over shingles of md5(i + "|" + shingle)` as lowercase hex —
  * exactly the value DuckDB computes with
  * `list_min(list_transform(sh, x -> md5(i || '|' || x)))`, but the k×|sh|
  * digest loop runs compiled instead of as interpreted HOF lambdas.
  *
  * Digests are compared as raw bytes (unsigned): hex encoding is monotonic
  * per byte, so byte order == hex-string lexicographic order.
  */
case class PortableMinHash(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"portable_minhash requires ARRAY<STRING>, got $other")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >>> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // "i|" prefixes, built once per expression instance — the per-digest
  // String.valueOf(i).getBytes allocation pair otherwise runs k times per
  // shingle across the whole corpus scan
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => (i.toString + "|").getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](k)
    var s = 0
    while (s < shingles.numElements()) {
      val sh = shingles.getUTF8String(s)
      if (sh != null) {
        val shBytes = sh.getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefixes(i))
          md.update(shBytes)
          val d = md.digest()
          if (mins(i) == null || lessUnsigned(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      s += 1
    }
    // no shingles → no signature (callers filter empties; SQL semantics:
    // min over an empty set is NULL, so the whole signature is NULL)
    if (mins(0) == null) null
    else new GenericArrayData(mins.map(d => toHex(d)).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
    copy(child = newChild)
}

object PortableMinHash {
  def apply(sh: Column, k: Int): Column =
    GraftBridge.column(PortableMinHash(GraftBridge.expression(sh), k))
}
