package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over per-key ordered series —
  * the smoothing/anomaly half of the time-series monitoring family
  * (RunningAgg carries exact running sums; EWMA is the standard
  * operational baseline for "is today's volume anomalous", Hunter 1986's
  * EWMA control chart, Holt's level-only case). A metrics pipeline
  * watching per-type event volume wants yesterday's noise discounted
  * geometrically, not an all-history mean (x19/x26 compare whole
  * distributions; this watches ONE series' level).
  *
  * EWMA is a sequential recurrence — e_t = α·x_t + (1−α)·e_{t−1} — so it
  * cannot be a window aggregate without float-power tricks; this engine
  * runs it the bp01/pk01 way: the corpus reduces map-side to the
  * (key, t, x) cell table FIRST (one shuffle on the key; the series
  * length is calendar-bounded planner-scale data, not corpus-scale),
  * each key's series folds scan-locally via the `aggregate` HOF, and the
  * recurrence is integer fixed-point — e_t = (x_t·α_ppm +
  * e_{t−1}·(1e6−α_ppm)) DIV 1e6, e_0 = x_0 — so every step replays
  * bit-for-bit on any engine/partitioning (a float EWMA would drift by
  * fold association), and the DuckDB oracle can unroll the same
  * recurrence with a recursive CTE. Long-safe while x·1e6 < 2^63 (a
  * 9.2e12-per-cell count — not a cell), x21's documented contract class.
  *
  * 100 TB shape: the ONLY corpus-scale work is the upstream cell
  * aggregation the caller already pays (map-side combined); everything
  * here runs on |keys|·|period| rows. Hot keys don't exist — the fold
  * input is one row per (key, t) by contract (enforce upstream with the
  * groupBy that builds the cells).
  */
object Ewma {

  /** Smooth `xCol` over each key's `tCol`-ordered series.
    * Returns one row per input row: (keyCol, tCol, xCol, ewma).
    *
    * @param series   one row per (key, t) — the pre-aggregated cell table
    * @param alphaPpm smoothing weight in integer millionths, 0 < α < 1e6
    *                 (250000 = the classic λ=0.25 control-chart choice) */
  def smooth(
      series: DataFrame,
      keyCol: String,
      tCol: String,
      xCol: String,
      alphaPpm: Long = 250000L
  ): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      s"alphaPpm must be in (0, 1e6), got $alphaPpm")
    val beta = 1000000L - alphaPpm
    val packed = series
      .select(col(keyCol).as("k"), col(tCol).as("t"), col(xCol).cast("long").as("x"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("s"))
    // fold the x-sequence into the ewma-sequence (array accumulator —
    // the sequential dependency is the algorithm, not a missed window),
    // then zip back positionally: zip_with keeps (t, x, ewma) aligned
    // without threading t's type through the fold accumulator
    packed
      .withColumn("es", expr(
        s"""aggregate(transform(s, e -> e.x), CAST(array() AS ARRAY<BIGINT>),
           (acc, x) -> concat(acc, array(CASE WHEN size(acc) = 0 THEN x
             ELSE (x * ${alphaPpm}L + element_at(acc, -1) * ${beta}L) DIV 1000000L
             END)))"""))
      .select(col("k"), expr(
        "inline(zip_with(s, es, (e, w) -> struct(e.t AS t, e.x AS x, w AS ewma)))"))
      .select(col("k").as(keyCol), col("t").as(tCol),
        col("x").as(xCol), col("ewma"))
  }
}
