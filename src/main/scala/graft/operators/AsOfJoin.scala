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

  /** Tag + pad + union the two sides: the shared front half of both as-of
    * variants. Returns the union and the left column list. */
  private def unioned(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTiebreak: String
  ): (DataFrame, Seq[String]) = {
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
    (lPadded.select(cols.map(col): _*)
      .unionByName(rPadded.select(cols.map(col): _*)), leftCols)
  }

  // Inclusive: right(0) sorts before left(1) at equal times, so a left row
  // sees same-instant right payloads. Strict: flip so left sorts first and
  // only strictly-earlier right rows have been carried forward.
  private def sideOrd(inclusive: Boolean): Column =
    if (inclusive) col("_is_l") else lit(1) - col("_is_l")

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
    val (u, leftCols) = unioned(left, right, leftKey, rightKey,
      leftTime, rightTime, payload, rightTiebreak)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), sideOrd(inclusive), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u)((df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("_is_l") === 1)
      .select((leftCols.map(col) ++ payload.map(c => col(s"asof_$c"))): _*)
  }

  /** Hot-key escape hatch for [[asofJoin]]: identical semantics, but the
    * per-key window is split by a caller-supplied monotone-in-time bucketing
    * (e.g. `t => floor(t / 86400)` for daily buckets on epoch seconds), so a
    * single pathologically hot key — 10⁸ rows land in ONE window sort
    * partition at 100× in the unsalted plan — is spread over
    * (key, bucket) partitions that AQE can schedule independently.
    *
    * Two-level last-value: (1) the carry-forward window runs within each
    * (key, bucket); (2) a per-(key, bucket) aggregate — per payload column,
    * the bucket's last non-null right value — is carried across buckets by a
    * second window whose partitions hold one row per bucket (tiny); a left
    * row falls back to the previous buckets' carry when its own bucket has
    * no earlier right row. Monotonicity of `bucketOf` guarantees every right
    * row in an earlier bucket is strictly earlier in time, so the fallback
    * is correct for both inclusive and strict semantics.
    *
    * Cost: one extra shuffle of the unioned table (on (key, bucket) instead
    * of key) plus a tiny aggregate/join — the documented trade for bounding
    * per-partition volume by bucket width rather than key frequency. */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightTiebreak: String,
      bucketOf: Column => Column,
      inclusive: Boolean = true
  ): DataFrame = {
    val (u0, leftCols) = unioned(left, right, leftKey, rightKey,
      leftTime, rightTime, payload, rightTiebreak)
    val u = u0.withColumn("_bkt", bucketOf(col("_t")))
    // (1) within-bucket carry — same ordering as the unsalted window
    val wIn = Window.partitionBy(col("_k"), col("_bkt"))
      .orderBy(col("_t"), sideOrd(inclusive), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = payload.foldLeft(u)((df, c) =>
      df.withColumn(s"_in_$c", last(col(c), ignoreNulls = true).over(wIn)))
    // (2) per-(key, bucket) last non-null right value, per payload column
    // (per-column independence matches last(_, ignoreNulls) semantics when a
    // right row carries nulls in some payload columns)
    val blAggs = payload.map(c => max_by(col(c),
      when(col("_is_l") === 0 && col(c).isNotNull,
        struct(col("_t"), col("_tb")))).as(s"_bl_$c"))
    val bucketLast = u.groupBy(col("_k"), col("_bkt"))
      .agg(blAggs.head, blAggs.tail: _*)
    // carry across STRICTLY earlier buckets; one row per (key, bucket)
    val wCarry = Window.partitionBy(col("_k")).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = payload.foldLeft(bucketLast)((df, c) =>
      df.withColumn(s"_pv_$c", last(col(s"_bl_$c"), ignoreNulls = true).over(wCarry)))
      .select(col("_k") +: col("_bkt") +: payload.map(c => col(s"_pv_$c")): _*)
    // every left row's (key, bucket) exists in `carry` by construction
    withIn.filter(col("_is_l") === 1).join(carry, Seq("_k", "_bkt"))
      .select((leftCols.map(col) ++ payload.map(c =>
        coalesce(col(s"_in_$c"), col(s"_pv_$c")).as(s"asof_$c"))): _*)
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
