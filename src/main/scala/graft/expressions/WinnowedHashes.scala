package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused winnowing fingerprint selection over a word array: the k-gram
  * [[PolyHash]]es and the w-window rightmost-tie minima in ONE compiled
  * pass — `winnow_hashes(words, k, w)` returns exactly
  * `Winnowing.winnowSelect(transform(shingles(words, k), PolyHash), w)`
  * (sorted distinct selected hashes; spec-pinned against the hand-rolled
  * reference AND the HOF formulation).
  *
  * Why (guide §1.2 step 2 — per-task work): the HOF formulation
  * materializes every k-gram STRING (O(n·k·len) bytes of transient
  * allocation per document), hashes each from scratch, then runs w−1
  * `zip_with` passes over struct arrays for the window fold. Here:
  *
  *   - per-word hash and 257^len(word) are computed once (one pass over
  *     the document's bytes); each gram hash is then k−1 modular
  *     combines — O(n·(k + len)) arithmetic instead of O(n·k·len), zero
  *     gram strings, zero struct arrays;
  *   - the window minimum runs as a monotone deque (pop-while ≥ keeps
  *     the RIGHTMOST of equal hashes — the robust-winnowing tie rule),
  *     O(n) total instead of O(n·w).
  *
  * Hash identity with [[PolyHash]] over the space-joined gram is exact:
  * h(a ∥ b) = (h(a)·257^len(b) + h(b)) mod p, and the joiner is the
  * single byte 0x20 — pure modular arithmetic, so the DuckDB oracle's
  * replay of the string-built grams still matches bit-for-bit.
  */
case class WinnowedHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k >= 1 && w >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"winnow_hashes: k and w must be >= 1, got k=$k w=$w")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"winnow_hashes requires ARRAY<STRING>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private final val M = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    // per-word hash + 257^len — one pass over the document's bytes
    val wh = new Array[Long](n)
    val wp = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null array elements hash like the HOF path: transform propagates
      // the null into the gram string → concat-with-null → null gram →
      // PolyHash(null) = null. The HOF window fold then PREFERS non-null
      // sides; rather than replicate null-poisoned grams (the words()
      // producer never emits nulls — it filters empty tokens), fail loud.
      if (words.isNullAt(i)) throw new IllegalArgumentException(
        s"winnow_hashes: null word at position $i — the words() producer " +
          "never emits nulls; clean the input instead")
      val bytes = words.getUTF8String(i).getBytes
      var h = 0L
      var p = 1L
      var j = 0
      while (j < bytes.length) {
        h = (h * 257L + (bytes(j) & 0xff)) % M
        p = (p * 257L) % M
        j += 1
      }
      wh(i) = h; wp(i) = p
      i += 1
    }
    // gram hashes: fold word hashes with the single space byte between
    val gh = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var h = wh(i)
      var j = 1
      while (j < k) {
        h = (h * 257L + 32L) % M              // the ' ' joiner byte
        h = (h * wp(i + j) + wh(i + j)) % M   // append word i+j
        j += 1
      }
      gh(i) = h
      i += 1
    }
    // monotone deque window minimum, ties → rightmost (pop back on >=)
    val nSel = nGrams - w + 1
    val sel = new Array[Long](nSel)
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    var t = 0
    while (t < nGrams) {
      while (tail > head && gh(dq(tail - 1)) >= gh(t)) tail -= 1
      dq(tail) = t; tail += 1
      val start = t - w + 1
      if (start >= 0) {
        while (dq(head) < start) head += 1
        sel(start) = gh(dq(head))
      }
      t += 1
    }
    // distinct + sort
    java.util.Arrays.sort(sel)
    var out = 1
    i = 1
    while (i < nSel) {
      if (sel(i) != sel(out - 1)) { sel(out) = sel(i); out += 1 }
      i += 1
    }
    val res = new Array[Any](out)
    i = 0
    while (i < out) { res(i) = sel(i); i += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedHashes =
    copy(child = newChild)

  override def prettyName: String = "winnow_hashes"
}

object WinnowedHashes {
  def apply(words: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowedHashes(GraftBridge.expression(words), k, w))
}
