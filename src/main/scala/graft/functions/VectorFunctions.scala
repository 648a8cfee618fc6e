package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ARRAY<FLOAT|DOUBLE>` embedding columns.
  * Pure Column expressions (codegen'd `aggregate`/`zip_with` folds) — no
  * UDF/serde cost, and the left-to-right fold order makes results
  * bit-reproducible across engines and runs.
  */
object VectorFunctions {

  /** Widen to double before arithmetic so accumulation happens in f64
    * regardless of the stored element type. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product — native codegen'd expression (same f64
    * accumulation order as the HOF formulation below, so results are
    * bit-identical; the loop just runs compiled instead of interpreted). */
  def dot(a: Column, b: Column): Column = graft.expressions.ArrayDot(a, b)

  /** Composable HOF formulation of the same fold (reference shape; used by
    * tests to cross-check the native expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; operands must already be double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Engine-portable hyperplane LSH signature: plane p's coefficient for
    * dimension i is derived from the first 4 hex chars of md5(p + "|" + i)
    * mapped to [-1, 1] — replayable by the DuckDB oracle (md5 + nibble
    * arithmetic + left-fold sums), so the whole ANN pipeline can be
    * hash-verified, not just row-counted. `tableSalt` offsets the plane
    * index so independent LSH tables draw disjoint hyperplanes. */
  def portableHyperplaneSig(v: Column, planes: Int, tableSalt: Int = 0): Column = {
    def coef(p: Int, i: Column): Column = {
      val h = md5(concat(lit(p.toString), lit("|"), i.cast("string")))
      val v4 = conv(substring(h, 1, 4), 16, 10).cast("int")
      (v4 / lit(32767.5)) - lit(1.0)
    }
    val bits = (0 until planes).map(_ + tableSalt).zipWithIndex.map { case (p, bit) =>
      val s = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * coef(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random hyperplane LSH signature: `planes` sign
    * bits, plane p's coefficient for dimension i derived from
    * `xxhash64(p * 131071 + i)` mapped to [-1, 1]. Bit-stable across runs
    * and executors with zero broadcast state. `tableSalt` offsets the plane
    * index so independent LSH tables draw disjoint hyperplanes. */
  def hyperplaneSig(v: Column, planes: Int, tableSalt: Int = 0): Column = {
    def coef(p: Int, i: Column): Column =
      (pmod(xxhash64(lit(p) * lit(131071L) + i), lit(2000001L)).cast("double")
        / lit(1000000.0)) - lit(1.0)
    val bits = (0 until planes).map(_ + tableSalt).zipWithIndex.map { case (p, bit) =>
      val s = aggregate(
        zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
          (x, i) => x * coef(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }
}
