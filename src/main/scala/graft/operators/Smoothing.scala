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

/** Theil–Sen robust trend estimation (Theil 1950, Sen 1968) — the TREND
  * member of the time-series monitoring family ([[Ewma]] watches the
  * level; this asks "is the series drifting, robustly"): the median of
  * all pairwise slopes, a 29%-breakdown estimator where the OLS slope
  * is dragged by a single outlier day. Integer-exact: slope_ppm =
  * (x_j − x_i)·1e6 DIV (t_j − t_i) on an integral time index (both
  * engines' integral division truncates toward zero — verified, so
  * negative slopes replay), and the median is percentile_disc's exact
  * order statistic.
  *
  * 100 TB shape: the corpus reduces map-side to (key, t, x) cells first
  * (the caller's aggregate); the pairwise self-join runs on the
  * calendar-bounded cell table — |period|² per key of PLANNER-scale
  * rows (30 days → 435 slope rows/key), never anything corpus-sized.
  */
object Trend {

  /** Median pairwise slope per key. `tCol` must be integral (day index,
    * epoch day — datediff upstream); one row per key:
    * (keyCol, n_points, n_pairs, slope_ppm). Keys with a single point
    * have no slope and are excluded, stated. */
  def theilSen(
      cells: DataFrame,
      keyCol: String,
      tCol: String,
      xCol: String
  ): DataFrame = {
    val c = cells.select(col(keyCol).as("k"),
      col(tCol).cast("long").as("t"), col(xCol).cast("long").as("x"))
    val a = c.select(col("k"), col("t").as("ta"), col("x").as("xa"))
    val b = c.select(col("k"), col("t").as("tb"), col("x").as("xb"))
    a.join(b, Seq("k")).filter(col("ta") < col("tb"))
      .select(col("k"),
        expr("((xb - xa) * 1000000L) DIV (tb - ta)").as("sl"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY sl) AS BIGINT)")
          .as("slope_ppm"))
      .join(c.groupBy("k").agg(count(lit(1)).as("n_points")), "k")
      .select(col("k").as(keyCol), col("n_points"), col("n_pairs"),
        col("slope_ppm"))
  }
}

/** One-sided upper CUSUM change-point chart (Page 1954) — the SHIFT
  * member of the monitoring family: where [[Ewma]]'s band flags single
  * anomalous days, CUSUM accumulates small SUSTAINED shifts until they
  * cross a decision interval — the textbook detector for "volume crept
  * up 1σ and stayed there", which a per-day band rarely trips on.
  *
  * Poisson-parameterized from the series itself: reference target =
  * the key's own discrete median m (exact percentile_disc), allowance
  * = ½σ with σ = isqrt(m) (Poisson), decision interval h = L·σ. The ½
  * is kept integral by running the statistic in DOUBLED units:
  * s2_t = max(0, s2_{t−1} + 2·x_t − (2m + isqrt(m))), alarm when
  * s2 > 2·L·isqrt(m). isqrt is floor(sqrt(m)) — one IEEE-754 sqrt,
  * correctly rounded by spec on both engines (d46's precedent) — so
  * the whole chart replays bit-for-bit; the recurrence folds with the
  * same aggregate-HOF machinery as [[Ewma]] and unrolls in the oracle
  * as a recursive CTE. Same 100 TB shape: cells first, |keys|·|period|
  * planner-scale everything after.
  */
object Cusum {

  /** @param reference the IN-CONTROL window the target/allowance/interval
    *        are fit on (proper chart usage: parameterize on a period known
    *        healthy, monitor everything after) — defaults to `cells`
    *        itself, the self-calibrating form whose median is robust to a
    *        minority of shifted points. Keys absent from the reference
    *        have no parameters and are excluded (no baseline, no
    *        verdict — stated). σ = isqrt(median) is FLOORED at 1: a
    *        zero-median (sparse) key would otherwise degenerate to
    *        k2 = h2 = 0 and alarm on its first nonzero cell.
    * @return one row per cell: (keyCol, tCol, xCol, cusum2 — the doubled
    *         statistic, h2 — the doubled decision interval, alarm). */
  def poissonUpper(
      cells: DataFrame,
      keyCol: String,
      tCol: String,
      xCol: String,
      l: Int = 4,
      reference: Option[DataFrame] = None
  ): DataFrame = {
    require(l >= 1, s"decision-interval multiplier l must be >= 1, got $l")
    val c = cells.select(col(keyCol).as("k"), col(tCol).as("t"),
      col(xCol).cast("long").as("x"))
    val refC = reference.fold(c)(r => r.select(col(keyCol).as("k"),
      col(tCol).as("t"), col(xCol).cast("long").as("x")))
    // σ floored at 1: a key whose reference median is 0 (sparse series)
    // would otherwise get k2 = h2 = 0 and alarm on its FIRST nonzero
    // cell — with the floor it needs the same sustained evidence as any
    // unit-variance series (k2 = 1, h2 = 2l), stated contract
    val params = refC.groupBy("k")
      .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)")
        .as("med"))
      .select(col("k"),
        expr("2L * med + greatest(CAST(floor(sqrt(med)) AS BIGINT), 1L)").as("k2"),
        expr(s"2L * ${l}L * greatest(CAST(floor(sqrt(med)) AS BIGINT), 1L)").as("h2"))
    val packed = c.join(params, "k") // |keys|-row broadcast side
      .groupBy(col("k"), col("k2"), col("h2"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("s"))
    packed
      .withColumn("cs", expr(
        """aggregate(transform(s, e -> e.x), CAST(array() AS ARRAY<BIGINT>),
           (acc, x) -> concat(acc, array(greatest(0L,
             CASE WHEN size(acc) = 0 THEN 0L ELSE element_at(acc, -1) END
               + 2L * x - k2))))"""))
      .select(col("k"), col("h2"), expr(
        "inline(zip_with(s, cs, (e, c) -> struct(e.t AS t, e.x AS x, c AS cusum2)))"))
      .select(col("k").as(keyCol), col("t").as(tCol), col("x").as(xCol),
        col("cusum2"), col("h2"),
        (col("cusum2") > col("h2")).as("alarm"))
  }
}
