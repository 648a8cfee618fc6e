package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * latest right row with the same key whose time is <= the left row's time.
  *
  * Spark has no built-in as-of join; instead of a non-equi range join (which
  * plans as a broadcast-nested-loop and explodes at scale) this uses the
  * union + last_value(ignoreNulls) window trick:
  *
  *   1. union left and right rows, tagged, with right payload columns
  *      null on left rows;
  *   2. one window per key ordered by (time, tag, tiebreak) carries the
  *      last non-null payload forward;
  *   3. keep only left rows.
  *
  * Cost: ONE shuffle on the key + a per-partition sort — linear at any
  * scale, skew-tolerant via AQE. With `inclusive=true` right rows sort
  * before left rows at equal times (match at t <= left time); with
  * `inclusive=false` left rows sort first, so only strictly-earlier right
  * rows (t < left time) are visible. `rightTiebreak` makes the winner among
  * equal-time right rows deterministic. Left rows with no earlier right row
  * get null payloads (left-outer semantics).
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: String,
      inclusive: Boolean = true
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = payload.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"asofJoin: payload columns ${collisions.mkString(", ")} collide with " +
        "left columns — the null padding would overwrite the left values; " +
        "rename them on one side first")
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_is_l", lit(1))
    val lPadded = payload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
      .withColumn("_tb", lit(null).cast(right.schema(rightTiebreak).dataType))
    val r0 = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_is_l", lit(0)).withColumn("_tb", col(rightTiebreak))
    val rPadded = leftCols.foldLeft(r0)((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (leftCols ++ Seq("_k", "_t", "_is_l", "_tb") ++ payload).distinct
    val u = lPadded.select(cols.map(col): _*)
      .unionByName(rPadded.select(cols.map(col): _*))
    // Inclusive: right(0) sorts before left(1) at equal times, so a left row
    // sees same-instant right payloads. Strict: flip so left sorts first and
    // only strictly-earlier right rows have been carried forward.
    val sideOrd = if (inclusive) col("_is_l") else lit(1) - col("_is_l")
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), sideOrd, col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u)((df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("_is_l") === 1)
      .select((leftCols.map(col) ++ payload.map(c => col(s"asof_$c"))): _*)
  }

  /** Range join against a (typically small, broadcast) interval table:
    * left rows matched to intervals [lo, hi). Broadcasting the interval
    * side turns the non-equi join into a scan-local nested loop — the only
    * scalable plan shape for interval lookup. */
  def rangeJoin(
      left: DataFrame,
      intervals: DataFrame,
      valueCol: String,
      loCol: String = "lo",
      hiCol: String = "hi"
  ): DataFrame =
    left.join(broadcast(intervals),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
}
