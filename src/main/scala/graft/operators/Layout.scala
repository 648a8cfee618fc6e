package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file skipping —
  * the `OPTIMIZE ZORDER BY` lever: parquet scans prune files/row-groups by
  * per-column min/max stats, but a single-column sort gives selective
  * layout on ONE column only. Interleaving the bits of several columns'
  * rank-scaled values and range-partitioning on the interleave makes every
  * output file a compact hyper-rectangle in ALL the z-ordered dimensions,
  * so a conjunctive box predicate touches O(perimeter) files instead of
  * all of them (locality spec-asserted on a uniform 2-D corpus).
  *
  * Everything is integer arithmetic — scale = `((v − min) · (2ᵇ−1)) DIV
  * (max − min)`, interleave = shift/or — so the z-value replays bit-exactly
  * in the DuckDB oracle (z01). The min/max normalization statistics come
  * from ONE tiny aggregate broadcast back onto the scan (a 1-row
  * crossJoin); the layout write itself is `repartitionByRange` on the
  * z-value + a within-partition sort — exactly one exchange, the same
  * shape any sorted write pays, at any corpus size.
  */
object Layout {

  /** Appends the Morton interleave of `cols` (each rank-scaled to `bits`
    * bits via corpus min/max) as column `out`. Constant columns scale to
    * 0 (degenerate dimensions cost nothing, they interleave as zeros).
    * `cols.size * bits` must stay under 63.
    *
    * A column whose range exceeds `Long.MaxValue / (2ᵇ−1)` (≈2^55 at the
    * default bits=8) would overflow the `(v − min) · maxRank` scale product
    * — under non-ANSI mode that wraps SILENTLY, answers stay correct but
    * the layout scrambles (files stop being hyper-rectangles and skipping
    * quietly dies). The scale expression therefore fails loud via
    * `raise_error` when the observed range breaches the budget: the check
    * rides the same broadcast stats row, costs nothing per-row after
    * codegen's common-subexpression pass, and turns a silent placement bug
    * into an actionable error (pre-quantize the column, or lower bits). */
  /** Rank-scales `cols` into `__zi_<c>` helper columns in [0, 2ᵇ−1] via
    * corpus min/max (one 1-row aggregate broadcast back) — the shared
    * front half of the Morton and Hilbert layouts. Caller drops the
    * `__zi_`/`__zmn_`/`__zmx_` helpers after consuming them. */
  private def rankScaled(
      df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val maxRank = (1L << bits) - 1
    // helper columns ride a crossJoin back onto the caller's frame — keep
    // them in a namespace no real schema uses so they can't collide/shadow
    val reserved = df.columns.filter(c =>
      c.startsWith("__zmn_") || c.startsWith("__zmx_") || c.startsWith("__zi_"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with the layout " +
        "operators' internal __zmn_/__zmx_/__zi_ namespace")
    val aggExprs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__zmn_$c"),
      max(col(c)).cast("long").as(s"__zmx_$c")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rangeBudget = Long.MaxValue / maxRank
    cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      acc.withColumn(s"__zi_$c",
        when(col(s"__zmx_$c") === col(s"__zmn_$c"), 0L)
          .when(col(s"__zmx_$c") - col(s"__zmn_$c") > rangeBudget ||
              col(s"__zmx_$c") - col(s"__zmn_$c") < 0, // range itself overflowed
            raise_error(concat(
              lit(s"layout: range of column '$c' exceeds the " +
                s"$rangeBudget budget at bits=$bits (min="),
              col(s"__zmn_$c"), lit(", max="), col(s"__zmx_$c"),
              lit(") — pre-quantize the column or lower bits"))).cast("long"))
          .otherwise(expr(
            s"((CAST(`$c` AS BIGINT) - `__zmn_$c`) * $maxRank) DIV (`__zmx_$c` - `__zmn_$c`)")))
    }
  }

  private def dropHelpers(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.flatMap(c =>
      Seq(s"__zi_$c", s"__zmn_$c", s"__zmx_$c")): _*)

  def mortonValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      out: String = "z_val"
  ): DataFrame = {
    require(cols.nonEmpty, "mortonValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds the 63-bit z-value budget")
    val d = cols.size
    val withScaled = rankScaled(df, cols, bits)
    // bit j of dimension i lands at position j*d + i — the textbook Morton
    // interleave, built from literal shift amounts so it stays a flat
    // codegen'd expression tree (no lambda, no loop at runtime)
    val z = (0 until bits).foldLeft(lit(0L): Column) { (acc, j) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a + shiftleft(shiftright(col(s"__zi_$c"), j).bitwiseAND(lit(1L)),
          j * d + i)
      }
    }
    dropHelpers(withScaled.withColumn(out, z), cols)
  }

  /** HILBERT-curve index for 2-D layout (Hilbert 1891; Faloutsos &
    * Roseman 1989 measured why you'd want it: consecutive Hilbert cells
    * are ALWAYS grid-neighbors, where the Morton curve takes a long
    * diagonal jump at every quadrant boundary — so range partitions cut
    * from the Hilbert order are rounder rectangles and a box predicate
    * touches slightly fewer files; z01/z06 are the two ends of the
    * classic locality trade: Morton generalizes to any dimension count
    * with flat shift/or codegen, Hilbert buys the no-jump guarantee at
    * the cost of a per-bit sequential walk and a 2-D restriction (the
    * clean xy2d recurrence; n-D Hilbert needs Butz's algorithm and is
    * out of scope, stated).
    *
    * The walk is the textbook xy2d loop — per bit level s = 2ᵇ⁻¹..1:
    * quadrant digit d += s²·((3rx) XOR ry) (arithmetized to a CASE so no
    * engine-specific XOR operator is needed), then the Wikipedia n-based
    * rotation (flip with 2ᵇ−1−coord keeps coordinates in [0, 2ᵇ) at
    * every step — the s-based flip variant walks through NEGATIVE
    * coordinates mid-fold, measured, which would poison the packing
    * below). Sequential dependency ⇒ the aggregate-HOF fold (bp01's
    * machinery), with (x, y, d) PACKED into one BIGINT accumulator
    * acc = (d·2ᵇ + x)·2ᵇ + y rather than a struct — DuckDB 1.0
    * miscompiles struct-field extraction out of lambda folds (measured:
    * r.d read through a projection returns a different walk than the
    * struct it came from), and the scalar fold is the engine-portable
    * form both sides replay bit-for-bit. Pack fits a long while
    * 4·bits ≤ 62 ⇒ bits ≤ 15 (require'd; default 8 matches Morton's). */
  def hilbertValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      out: String = "h_val"
  ): DataFrame = {
    require(cols.size == 2,
      s"hilbertValue is 2-D (the classic xy2d walk), got ${cols.size} cols")
    require(bits >= 1 && bits <= 15,
      s"bits must be in [1, 15] (packed-accumulator budget), got $bits")
    val p = 1L << bits
    val withScaled = rankScaled(df, cols, bits)
    val (xc, yc) = (s"`__zi_${cols.head}`", s"`__zi_${cols(1)}`")
    val X = s"((acc DIV ${p}L) % ${p}L)"
    val Y = s"(acc % ${p}L)"
    val D = s"(acc DIV ${p * p}L)"
    val RX = s"(($X & s) <> 0)"
    val RY = s"(($Y & s) <> 0)"
    val fold = s"""
      aggregate(
        transform(sequence(${bits - 1}, 0, -1),
          k -> shiftleft(CAST(1 AS BIGINT), k)),
        CAST($xc AS BIGINT) * ${p}L + $yc,
        (acc, s) ->
          (($D + s * s * (CASE WHEN NOT $RX
                THEN (CASE WHEN $RY THEN 1L ELSE 0L END)
                ELSE (CASE WHEN $RY THEN 2L ELSE 3L END) END)
           ) * ${p}L
           + (CASE WHEN $RY THEN $X
               WHEN $RX THEN ${p - 1}L - $Y
               ELSE $Y END)
          ) * ${p}L
          + (CASE WHEN $RY THEN $Y
              WHEN $RX THEN ${p - 1}L - $X
              ELSE $X END)
      ) DIV ${p * p}L"""
    dropHelpers(withScaled.withColumn(out, expr(fold)), cols)
  }

  /** Writes `df` parquet Hilbert-ordered on two columns — zorderWrite's
    * shape with the no-jump curve. */
  def hilbertWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      nFiles: Int,
      bits: Int = 8
  ): Unit =
    hilbertValue(df, cols, bits)
      .repartitionByRange(nFiles, col("h_val"))
      .sortWithinPartitions("h_val")
      .drop("h_val")
      .write.mode("overwrite").parquet(path)

  /** Writes `df` parquet z-ordered on `cols` into ~`nFiles` files: morton
    * value → range partition → within-partition sort → write (the z column
    * itself is dropped; it exists to place rows, not to be stored). */
  def zorderWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      nFiles: Int,
      bits: Int = 8
  ): Unit =
    mortonValue(df, cols, bits)
      .repartitionByRange(nFiles, col("z_val"))
      .sortWithinPartitions("z_val")
      .drop("z_val")
      .write.mode("overwrite").parquet(path)
}
