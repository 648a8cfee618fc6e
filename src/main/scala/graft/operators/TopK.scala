package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k variants.
  *
  * The plain formulation (one window rank over the group key) is optimal
  * until one group is pathologically hot: a window partition cannot be split
  * by AQE, so a key with 10⁸ rows at 100× sorts in a single task — the same
  * bound PLANS.md documents for the as-of join. [[perGroupSalted]] is the
  * escape hatch: rows first compete inside (group, salt) buckets, then only
  * the k survivors per bucket — at most k × salts rows per group — meet in
  * the final per-group ranking. Correct because a row outside its bucket's
  * top-k cannot be in the group's top-k (rank is monotone under subsetting).
  */
object TopK {

  /** Plain per-group top-k: one shuffle on the group keys. `order` must be a
    * total order (include a tiebreak) for deterministic results. */
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Hot-key-safe per-group top-k, identical results to [[perGroup]] given a
    * total `order`. `saltOf` spreads a group's rows across buckets — any
    * deterministic row-level expression works (e.g. `xxhash64` of a unique
    * id); per-partition volume is bounded by bucket size, not key frequency. */
  def perGroupSalted(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      k: Int,
      saltOf: Column,
      salts: Int = 32
  ): DataFrame = {
    val salted = df.withColumn("_salt", pmod(saltOf, lit(salts)))
    val wIn = Window.partitionBy((groupCols :+ "_salt").map(col): _*).orderBy(order: _*)
    val survivors = salted.withColumn("_rn", row_number().over(wIn))
      .filter(col("_rn") <= k).drop("_rn", "_salt")
    val wOut = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    survivors.withColumn("_rn", row_number().over(wOut))
      .filter(col("_rn") <= k).drop("_rn")
  }
}
