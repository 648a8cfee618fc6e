package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-char-window Rabin–Karp hashes of a string in ONE O(n) pass:
  * `out[i] = hash(substr(text, i+1, k))` for i in [0, n−k], empty array
  * when the text is shorter than k characters.
  *
  * This exists for the substring-dedup anchor path ([[graft.operators.Dedup
  * .substringSpans]]): the composed form — `transform(sequence(...),
  * i => substr(text, i, k))` then `xxhash64` per element — materializes a
  * k-char UTF8String per POSITION before hashing, i.e. O(n·k) bytes
  * allocated per document. Here the window hash rolls
  * (`h' = h·B − cp·Bᵏ + cp_next`, wrapping 64-bit, B = 1000003), so the
  * whole anchor table costs one pass over the text and one primitive long
  * array — no per-window strings ever exist.
  *
  * Characters are UTF-8 code points folded to an int from their encoded
  * bytes (UTF-8 is a prefix code, so the fold is injective per char):
  * equal k-char windows hash equal on ANY input, and window indexing is
  * char-positional, matching `substr` semantics byte-width or not.
  *
  * Collision bound: for RANDOM text this is the usual 64-bit birthday
  * tradeoff, but a fixed-base polynomial over a power-of-two modulus is
  * strictly weaker than a keyed avalanche hash (xxhash64) against
  * structured inputs — low-entropy/periodic text and engineered
  * anti-testcases fall into algebraic collision classes (e.g. windows
  * whose difference polynomial is divisible by a large power of two). A
  * collision marks a FALSE duplicate anchor in substringSpans — real,
  * non-duplicated text gets treated as duplicated and dropped — so the
  * random-text birthday bound quoted at the call site is an optimistic
  * floor, not a guarantee. If adversarial or highly periodic corpora are
  * in scope, draw a random odd base per run (or hash modulo a Mersenne
  * prime) instead of this fixed default.
  */
case class RollingHashWindows(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, s"window length must be >= 2, got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_windows requires STRING input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // decode chars to injective int codes (the char's UTF-8 bytes folded)
    val cps = new Array[Int](bytes.length)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      var cp = 0
      var j = 0
      while (j < w && i + j < bytes.length) {
        cp = (cp << 8) | (bytes(i + j) & 0xff); j += 1
      }
      cps(n) = cp
      n += 1
      i += w
    }
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    var bk = 1L // B^k, wrapping
    i = 0
    while (i < k) { bk *= B; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = h * B - cps(i - k) * bk + cps(i)
      out(i - k + 1) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashWindows = copy(child = newChild)
}

object RollingHashWindows {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(RollingHashWindows(GraftBridge.expression(c), k))
}
