package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unbounded running aggregation (q10's shape) and its hot-key escape
  * hatch. Running state crosses every bucket, so the rescue is two-level:
  * a running sum WITHIN each (key, time-bucket) plus the prefix sum of
  * whole-bucket totals from strictly earlier buckets (one tiny window over
  * one row per bucket), added together. Exact for decimal values (addition
  * reassociates losslessly); for floats it changes the fold order — use
  * decimal in, cast out, as the query registry does. Requires
  * `timeCol +: tiebreak` to be a total order (same as the plain window
  * needs for determinism).
  */
object RunningAgg {

  def runningSum(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tiebreak: Seq[String],
      valueCol: String,
      out: String = "running_sum"
  ): DataFrame = {
    // Explicit ROWS frame (not the default RANGE frame): RANGE would give
    // tied rows the peer-inclusive sum, silently diverging from the
    // bucketed variant's per-row fold when (timeCol, tiebreak) is not a
    // total order. With a total order the two frames agree; without one,
    // ROWS keeps both variants on identical (if order-dependent) semantics.
    val w = Window.partitionBy(col(keyCol))
      .orderBy((timeCol +: tiebreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(col(valueCol)).over(w))
  }

  /** Hot-key-safe variant, identical results given a total order and a
    * numeric time column. */
  def runningSumBucketed(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tiebreak: Seq[String],
      valueCol: String,
      bucketWidth: Long,
      out: String = "running_sum"
  ): DataFrame = {
    val withBkt = df.withColumn("_bkt", floor(col(timeCol) / bucketWidth))
    val wIn = Window.partitionBy(col(keyCol), col("_bkt"))
      .orderBy((timeCol +: tiebreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = withBkt.withColumn("_run_in", sum(col(valueCol)).over(wIn))
    // one row per (key, bucket): the bucket's total, then the prefix of
    // strictly-earlier buckets — a window over a tiny table
    val totals = withBkt.groupBy(col(keyCol), col("_bkt"))
      .agg(sum(col(valueCol)).as("_tot"))
    val wPfx = Window.partitionBy(col(keyCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals
      .withColumn("_pfx", sum(col("_tot")).over(wPfx))
      .select(col(keyCol), col("_bkt"), col("_pfx"))
    within.join(prefix, Seq(keyCol, "_bkt"))
      .withColumn(out, col("_run_in") + coalesce(col("_pfx"), lit(0)))
      .drop("_bkt", "_run_in", "_pfx")
  }
}

/** Trailing range-frame aggregation (e.g. "sum of the last 30 days" per
  * key, the w02 shape) and its hot-key escape hatch.
  *
  * The plain formulation cannot be split by AQE and — unlike rank filters,
  * which Spark 4 rescues with `WindowGroupLimit` — a range-frame SUM gets no
  * optimizer help: a single hot key sorts all its rows in one task. The
  * bucketed variant bounds the partition by time-bucket width instead:
  * every row lands in its own bucket, and rows within `frame` of a bucket's
  * end are ALSO copied into the next bucket as context (a trailing frame
  * can reach at most `frame` back, so with `bucketWidth >= frame` the
  * context copies are exactly the out-of-bucket rows any frame needs).
  * Windows run per (key, bucket); context rows are dropped from the output.
  * Cost: the boundary duplication is `frame / bucketWidth` of the data —
  * pick a bucket a few times the frame width.
  */
object TrailingAgg {

  /** Plain per-key trailing sum over `[time - frame, time]` (inclusive). */
  def trailingSum(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      frame: Long,
      out: String = "trailing_sum"
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rangeBetween(-frame, 0)
    df.withColumn(out, sum(col(valueCol)).over(w))
  }

  /** Hot-key-safe variant, identical results given `bucketWidth >= frame`
    * and a numeric (e.g. epoch) time column. */
  def trailingSumBucketed(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      frame: Long,
      bucketWidth: Long,
      out: String = "trailing_sum"
  ): DataFrame = {
    require(bucketWidth >= frame,
      s"bucketWidth ($bucketWidth) must be >= frame ($frame): a trailing " +
        "frame may reach one full frame into the previous bucket only")
    val bkt = floor(col(timeCol) / bucketWidth)
    val own = df.withColumn("_bkt", bkt).withColumn("_ctx", lit(0))
    // rows within `frame` of their bucket's end serve as context for the
    // next bucket's earliest frames
    val ctx = df.filter(col(timeCol) >= (bkt + 1) * bucketWidth - frame)
      .withColumn("_bkt", bkt + 1).withColumn("_ctx", lit(1))
    val w = Window.partitionBy(col(keyCol), col("_bkt")).orderBy(col(timeCol))
      .rangeBetween(-frame, 0)
    own.unionByName(ctx)
      .withColumn(out, sum(col(valueCol)).over(w))
      .filter(col("_ctx") === 0).drop("_bkt", "_ctx")
  }
}

/** Next-event lookup — `lead(time, 1)` per key (the w05 time-weighted-
  * average shape: each row's value holds until the next event) — and its
  * hot-key escape hatch, completing the per-family hatch set (rank →
  * WindowGroupLimit; last_value carry → asofJoinBucketed; range-frame →
  * trailingSumBucketed; running → runningSumBucketed; lead → this).
  *
  * The bucketed variant is exact for ANY column types because no
  * arithmetic touches the carried value: lead within each (key, bucket),
  * and the last row of a bucket takes the MIN time of the key's next
  * non-empty bucket — which is precisely the next row's time, looked up
  * via a lead over the one-row-per-bucket firsts table (a tiny window).
  * Rows with no successor anywhere stay null, matching the plain lead. */
object NextEvent {

  /** Plain per-key next-event time. `timeCol +: tiebreak` must be a total
    * order for determinism (same requirement as the plain window). */
  def nextTime(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tiebreak: Seq[String],
      out: String = "next_t"
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((timeCol +: tiebreak).map(col): _*)
    df.withColumn(out, lead(col(timeCol), 1).over(w))
  }

  /** Hot-key-safe variant, identical results for a numeric time column.
    * Per-partition volume is bounded by bucket density; the cross-bucket
    * carry is one row per (key, bucket). */
  def nextTimeBucketed(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tiebreak: Seq[String],
      bucketWidth: Long,
      out: String = "next_t"
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // exact long floor-bucketing (Column./ would round through DOUBLE)
    val bkt = call_function("div",
      col(timeCol).cast("long") - pmod(col(timeCol).cast("long"), lit(bucketWidth)),
      lit(bucketWidth))
    val withBkt = df.withColumn("_bkt", bkt)
    val wIn = Window.partitionBy(col(keyCol), col("_bkt"))
      .orderBy((timeCol +: tiebreak).map(col): _*)
    val within = withBkt.withColumn("_next_in", lead(col(timeCol), 1).over(wIn))
    val firsts = withBkt.groupBy(col(keyCol), col("_bkt"))
      .agg(min(col(timeCol)).as("_first"))
    val wB = Window.partitionBy(col(keyCol)).orderBy(col("_bkt"))
    val carry = firsts
      .withColumn("_nb_first", lead(col("_first"), 1).over(wB))
      .select(col(keyCol), col("_bkt"), col("_nb_first"))
    within.join(carry, Seq(keyCol, "_bkt"))
      .withColumn(out, coalesce(col("_next_in"), col("_nb_first")))
      .drop("_bkt", "_next_in", "_nb_first")
  }
}
