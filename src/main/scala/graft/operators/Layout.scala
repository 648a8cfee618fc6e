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
    * `cols.size * bits` must stay under 63. */
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
    val aggExprs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"mn_$c"),
      max(col(c)).cast("long").as(s"mx_$c")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*)
    val d = cols.size
    val withScaled = cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      acc.withColumn(s"_zi_$c",
        when(col(s"mx_$c") === col(s"mn_$c"), 0L)
          .otherwise(expr(
            s"((CAST(`$c` AS BIGINT) - `mn_$c`) * $maxRank) DIV (`mx_$c` - `mn_$c`)")))
    }
    // bit j of dimension i lands at position j*d + i — the textbook Morton
    // interleave, built from literal shift amounts so it stays a flat
    // codegen'd expression tree (no lambda, no loop at runtime)
    val z = (0 until bits).foldLeft(lit(0L): Column) { (acc, j) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a + shiftleft(shiftright(col(s"_zi_$c"), j).bitwiseAND(lit(1L)),
          j * d + i)
      }
    }
    withScaled.withColumn(out, z)
      .drop(cols.flatMap(c => Seq(s"_zi_$c", s"mn_$c", s"mx_$c")): _*)
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
