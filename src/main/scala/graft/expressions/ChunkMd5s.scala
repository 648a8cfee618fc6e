package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-position chunk fingerprints in one compiled pass:
  * `chunk_md5s(words, cw)` returns the md5 hex of every consecutive
  * `cw`-word chunk (final partial chunk counts; space-joined, exactly the
  * string `md5(array_join(slice(ws, ci·cw+1, cw), " "))` hashes), without
  * ever BUILDING the chunk string — each word's bytes and the single
  * 0x20 joiner stream straight into the digest.
  *
  * Why (guide §1.2 step 2, the `winnow_hashes` precedent): the HOF
  * formulation `transform(sequence(...), ci -> array_join(slice(...)))`
  * copies a word-array slice and materializes a chunk string per chunk
  * before md5 sees it — pure transient allocation on the hottest scan of
  * the contamination family (d53's from-scratch chunking, the
  * ClosureStore build, every foldDelta batch).
  *
  * Word elements must be non-null (the words() producer filters empties
  * and never yields nulls); null elements fail loud rather than silently
  * diverge from the HOF form's null-propagation.
  */
case class ChunkMd5s(child: Expression, cw: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if cw >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(s"chunk_md5s: cw must be >= 1, got $cw")
      case other => TypeCheckResult.TypeCheckFailure(
        s"chunk_md5s requires ARRAY<STRING>, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

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

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = (n + cw - 1) / cw
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nChunks)
    var ci = 0
    while (ci < nChunks) {
      md.reset()
      val start = ci * cw
      val end = math.min(start + cw, n)
      var i = start
      while (i < end) {
        if (ws.isNullAt(i)) throw new IllegalArgumentException(
          s"chunk_md5s: null word at position $i — the words() producer " +
            "never emits nulls; clean the input instead")
        if (i > start) md.update(' '.toByte)
        md.update(ws.getUTF8String(i).getBytes)
        i += 1
      }
      out(ci) = toHex(md.digest())
      ci += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkMd5s =
    copy(child = newChild)

  override def prettyName: String = "chunk_md5s"
}

object ChunkMd5s {
  def apply(words: Column, cw: Int): Column =
    GraftBridge.column(ChunkMd5s(GraftBridge.expression(words), cw))
}
