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

  /** Driver-side mirror of the portable coefficient expression
    * `conv(substring(md5(p || '|' || i), 1, 4), 16, 10) / 32767.5 - 1.0`:
    * RFC-1321 MD5 hex + int parse + the identical double arithmetic, so the
    * value is bit-equal to what Catalyst (and the DuckDB oracle) compute. */
  private def coefPortableD(p: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p|$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v4 = ((d(0) & 0xff) << 8) | (d(1) & 0xff) // first 4 hex chars
    v4 / 32767.5 - 1.0
  }

  /** Driver-side mirror of the xxhash64 coefficient — evaluated with the
    * SAME Catalyst XxHash64 expression (seed 42) the per-row formulation
    * compiles to, so the plane matrix is bit-equal by construction. */
  private def coefXxD(p: Int, i: Long): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit, XxHash64}
    val h = XxHash64(Seq(CLit(p * 131071L + i)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    val m = 2000001L
    (((h % m) + m) % m).toDouble / 1000000.0 - 1.0
  }

  /** Shared shape of both signature families: per plane, a native ArrayDot
    * against the precomputed coefficient row, sign bit shifted into place.
    * Same left-to-right f64 fold order as the per-row HOF derivation, so
    * results are bit-identical — only the md5/xxhash work moves from
    * O(rows × planes × dim) to O(planes × dim) on the driver. */
  private def sigFromMatrix(v: Column, planeRows: Seq[Array[Double]]): Column = {
    val bits = planeRows.zipWithIndex.map { case (coefs, bit) =>
      when(graft.expressions.ArrayDot(v, lit(coefs)) > 0,
        shiftleft(lit(1L), bit)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Engine-portable hyperplane LSH signature: plane p's coefficient for
    * dimension i is derived from the first 4 hex chars of md5(p + "|" + i)
    * mapped to [-1, 1] — replayable by the DuckDB oracle (md5 + nibble
    * arithmetic + left-fold sums), so the whole ANN pipeline can be
    * hash-verified, not just row-counted. `tableSalt` offsets the plane
    * index so independent LSH tables draw disjoint hyperplanes.
    *
    * `dim` fixes the vector dimensionality: the plane matrix is evaluated
    * ONCE on the driver (see [[portableHyperplaneSigHof]] for the per-row
    * formulation it is bit-identical to) and shipped as literal arrays. */
  def portableHyperplaneSig(v: Column, planes: Int, dim: Int, tableSalt: Int): Column =
    sigFromMatrix(v, (0 until planes).map(_ + tableSalt).map(p =>
      Array.tabulate(dim)(i => coefPortableD(p, i))))

  /** Per-row HOF formulation of [[portableHyperplaneSig]] — reference shape,
    * kept for parity tests and for corpora with heterogeneous dims. */
  def portableHyperplaneSigHof(v: Column, planes: Int, tableSalt: Int = 0): Column = {
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
    * index so independent LSH tables draw disjoint hyperplanes. Plane matrix
    * precomputed driver-side exactly as in [[portableHyperplaneSig]]. */
  def hyperplaneSig(v: Column, planes: Int, dim: Int, tableSalt: Int): Column =
    sigFromMatrix(v, (0 until planes).map(_ + tableSalt).map(p =>
      Array.tabulate(dim)(i => coefXxD(p, i.toLong))))

  /** Per-plane left-fold dot products against the portable plane matrix —
    * the MARGINS behind [[portableHyperplaneSig]]'s sign bits (|dots[p]| is
    * the query's distance to hyperplane p's boundary, up to the plane's
    * norm). Computed with the same ArrayDot fold as the signature, so
    * sign(dots[p]) and signature bit p agree bit-for-bit — margin-ordered
    * multi-probe (Lv et al. 2007) can rank flip candidates without ever
    * disagreeing with the bucket assignment. */
  def portablePlaneDots(v: Column, planes: Int, dim: Int, tableSalt: Int): Column =
    dotsFromMatrix(v, (0 until planes).map(_ + tableSalt).map(p =>
      Array.tabulate(dim)(i => coefPortableD(p, i))))

  /** xxhash64-family analog of [[portablePlaneDots]] (margins for
    * [[hyperplaneSig]]). */
  def planeDots(v: Column, planes: Int, dim: Int, tableSalt: Int): Column =
    dotsFromMatrix(v, (0 until planes).map(_ + tableSalt).map(p =>
      Array.tabulate(dim)(i => coefXxD(p, i.toLong))))

  private def dotsFromMatrix(v: Column, planeRows: Seq[Array[Double]]): Column =
    array(planeRows.map(coefs => graft.expressions.ArrayDot(v, lit(coefs))): _*)

  /** Per-row HOF formulation of [[hyperplaneSig]] — parity-test reference. */
  def hyperplaneSigHof(v: Column, planes: Int, tableSalt: Int = 0): Column = {
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
