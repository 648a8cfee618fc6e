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
  def mortonValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      out: String = "z_val"
  ): DataFrame = {
    require(cols.nonEmpty, "mortonValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds the 63-bit z-value budget")
    val maxRank = (1L << bits) - 1
    // helper columns ride a crossJoin back onto the caller's frame — keep
    // them in a namespace no real schema uses so they can't collide/shadow
    val reserved = df.columns.filter(c =>
      c.startsWith("__zmn_") || c.startsWith("__zmx_") || c.startsWith("__zi_"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with mortonValue's " +
        "internal __zmn_/__zmx_/__zi_ namespace")
    val aggExprs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__zmn_$c"),
      max(col(c)).cast("long").as(s"__zmx_$c")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*)
    val d = cols.size
    val rangeBudget = Long.MaxValue / maxRank
    val withScaled = cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      acc.withColumn(s"__zi_$c",
        when(col(s"__zmx_$c") === col(s"__zmn_$c"), 0L)
          .when(col(s"__zmx_$c") - col(s"__zmn_$c") > rangeBudget ||
              col(s"__zmx_$c") - col(s"__zmn_$c") < 0, // range itself overflowed
            raise_error(concat(
              lit(s"mortonValue: range of column '$c' exceeds the " +
                s"$rangeBudget budget at bits=$bits (min="),
              col(s"__zmn_$c"), lit(", max="), col(s"__zmx_$c"),
              lit(") — pre-quantize the column or lower bits"))).cast("long"))
          .otherwise(expr(
            s"((CAST(`$c` AS BIGINT) - `__zmn_$c`) * $maxRank) DIV (`__zmx_$c` - `__zmn_$c`)")))
    }
    // bit j of dimension i lands at position j*d + i — the textbook Morton
    // interleave, built from literal shift amounts so it stays a flat
    // codegen'd expression tree (no lambda, no loop at runtime)
    val z = (0 until bits).foldLeft(lit(0L): Column) { (acc, j) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a + shiftleft(shiftright(col(s"__zi_$c"), j).bitwiseAND(lit(1L)),
          j * d + i)
      }
    }
    withScaled.withColumn(out, z)
      .drop(cols.flatMap(c => Seq(s"__zi_$c", s"__zmn_$c", s"__zmx_$c")): _*)
  }

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
