package graft.operators

import graft.expressions.QSketch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass ANALYZE-style column profiling — the generic operator behind
  * the x18 query (which used to hard-code its four columns): for each
  * requested column, row count, non-null/null counts, distinct
  * cardinalities, min/max, and (numeric columns) sketched p50/p95, all
  * riding ONE aggregate over ONE scan of the input. The wide single
  * aggregate row is unpivoted by exploding a literal array of structs —
  * the dynamic-arity equivalent of `stack()`.
  *
  * The reference's reusable "enrichment stage" idiom
  * (smartpipeline/helpers.py:10-32 — a component you point at data rather
  * than a copy-pasted query) is the shape this operator restores for
  * profiling.
  *
  * == Exact vs approx: the 100 TB contract ==
  *
  * `exact = false` (the DEFAULT, and the at-scale shape) profiles with
  * `approx_count_distinct` only: the plan is a single-branch
  * map-side-combined aggregate — Scan → partial agg → 1-row exchange —
  * with NO Expand, at any number of columns. `exact = true` adds exact
  * `countDistinct` per column, which forces Catalyst's Expand (the input
  * fans out ×(cols+1) through the scan): affordable when the profile IS
  * the deliverable (x18 uses it as its hash-compared oracle payload),
  * wrong as a routine pass over a 100 TB table. `n_distinct` is NULL when
  * `exact = false`.
  *
  * Quantiles come from the mergeable GK sketch
  * ([[graft.expressions.QSketch]], the x17 machinery) at `quantileEps`
  * relative rank error, computed in the SAME pass — no second scan, no
  * sort. Sketch estimates are merge-order (hence partitioning) dependent:
  * like every sketch in this engine they are for HUMAN/planner
  * consumption and must not be hash-compared or used in replay-exact
  * gates (x18 keeps them OUT of its oracle payload; the spec checks rank
  * bounds, not values). Non-numeric columns profile with NULL quantiles;
  * min/max are cast to string after aggregating so heterogeneous column
  * types share one output schema.
  */
object Profiler {

  /** Profile `cols` of `df` in one pass. Output: one row per column —
    * (col_name, n_rows, n_nonnull, n_null, n_distinct, approx_distinct,
    * min_val, max_val, p50, p95). A zero-row input profiles as all-zero
    * counts with NULL min/max/quantiles (the aggregate still emits its
    * one row; the explode still emits one row per column). */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = false,
      quantileEps: Double = 0.01
  ): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    val isNum: Map[String, Boolean] = cols.map { c =>
      c -> (df.schema(c).dataType match {
        case _: NumericType => true
        case _ => false
      })
    }.toMap

    // every metric for every column in ONE agg — the operator's whole point
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
        val base = Seq(
          count(col(c)).as(s"nn_$i"),
          approx_count_distinct(col(c)).as(s"ad_$i"),
          min(col(c)).cast("string").as(s"mn_$i"),
          max(col(c)).cast("string").as(s"mx_$i"))
        val nd = if (exact) Seq(countDistinct(col(c)).as(s"nd_$i")) else Nil
        val sk = if (isNum(c))
          Seq(QSketch.sketchAgg(col(c).cast("double"), quantileEps).as(s"sk_$i"))
        else Nil
        base ++ nd ++ sk
      }
    val agged = df.agg(aggs.head, aggs.tail: _*)

    val perCol = array(cols.zipWithIndex.map { case (c, i) =>
      val ndCol = if (exact) col(s"nd_$i") else lit(null).cast("long")
      val (p50, p95) =
        if (isNum(c))
          (QSketch.query(col(s"sk_$i"), 0.5), QSketch.query(col(s"sk_$i"), 0.95))
        else (lit(null).cast("double"), lit(null).cast("double"))
      struct(
        lit(c).as("col_name"),
        col(s"nn_$i").as("n_nonnull"),
        ndCol.as("n_distinct"),
        col(s"ad_$i").as("approx_distinct"),
        col(s"mn_$i").as("min_val"),
        col(s"mx_$i").as("max_val"),
        p50.as("p50"),
        p95.as("p95"))
    }: _*)
    agged.select(col("n_rows"), explode(perCol).as("m"))
      .select(col("m.col_name"), col("n_rows"), col("m.n_nonnull"),
        (col("n_rows") - col("m.n_nonnull")).as("n_null"),
        col("m.n_distinct"), col("m.approx_distinct"),
        col("m.min_val"), col("m.max_val"), col("m.p50"), col("m.p95"))
  }

  /** Per-side key histograms for [[joinProfile]]/[[joinHotKeys]]: the
    * full-outer join of the two (key → count) tables — each side reduced
    * map-side to its distinct keys BEFORE anything crosses an exchange,
    * so profiling a 100 TB ⋈ 100 TB join shuffles key histograms, never
    * rows. NULL keys never equi-match, so each side's NULL group lands as
    * an unmatched row (SQL join semantics, stated not special-cased). */
  private def keyHistograms(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val l = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val r = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    l.join(r, Seq("k"), "full_outer")
  }

  /** Pre-flight JOIN cardinality and skew advisor — the "curse of the
    * last reducer" check to run BEFORE committing a 100 TB equi-join to a
    * plan: exact output cardinality (Σ over matched keys of cl·cr — the
    * contribution a shuffle join materializes per key), matched /
    * left-only / right-only key counts, and the largest single-key
    * contribution (the one number that says whether j02's salting or
    * AQE skew-split is needed, and how wide). One row; everything exact
    * integer so the verdict replays bit-for-bit. Per-key products are
    * longs and the total is summed in DECIMAL before the final BIGINT
    * cast, so the estimate survives hot keys up to 2^63 output rows —
    * past that the answer itself is the warning. */
  def joinProfile(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val matched = col("cl").isNotNull && col("cr").isNotNull
    keyHistograms(left, leftKey, right, rightKey).agg(
      coalesce(sum(when(matched, (col("cl") * col("cr"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .otherwise(lit(0))), lit(0)).cast("long").as("est_rows"),
      coalesce(sum(when(matched, 1L).otherwise(0L)), lit(0L))
        .as("n_keys_matched"),
      coalesce(sum(when(col("cr").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_keys_left_only"),
      coalesce(sum(when(col("cl").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_keys_right_only"),
      max(when(matched, col("cl") * col("cr"))).as("max_contribution"))
  }

  /** The advisor's detail view: the `k` heaviest matched keys by output
    * contribution (cl·cr), ties to the smallest key — the keys to salt.
    * TakeOrderedAndProject keeps this a per-partition-heap top-k at any
    * key cardinality. */
  def joinHotKeys(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, k: Int): DataFrame =
    keyHistograms(left, leftKey, right, rightKey)
      .filter(col("cl").isNotNull && col("cr").isNotNull)
      .select(col("k"), col("cl"), col("cr"),
        (col("cl") * col("cr")).as("contribution"))
      .orderBy(col("contribution").desc, col("k").asc)
      .limit(k)

  /** SPEARMAN rank correlation between two integer signals (Spearman
    * 1904) — the signal-REDUNDANCY audit of the profiling family: a
    * curation pipeline gating on several quality scores is implicitly
    * assuming they measure different things; a |ρ| near 1 says two
    * gates are one gate (and a monotone-robust ρ is the right check —
    * Pearson on raw values is dragged by the same outliers the gates
    * exist to catch).
    *
    * Engine-exact throughout, no global sort and no libm sqrt:
    *   - tie-averaged ranks come from the VALUE HISTOGRAM, not a
    *     corpus-wide window — rank2(v) = 2·cum_before(v) + count(v) + 1
    *     is twice the classical average rank, integral even at .5 ties;
    *     the histogram cum-sum runs single-partition on distinct-value
    *     scale (Lm.fitThresholds' contract) and joins back broadcast;
    *   - ranks are CENTERED (a' = rank2 − (n+1), so Σa' = 0) which
    *     collapses Pearson-on-ranks to ρ = Σa'b' / √(Σa'²·Σb'²);
    *   - the root is avoided with x04's rational-surrogate move: report
    *     sign(Σa'b') and ρ²_ppm = (Σa'b')²·1e6 DIV (Σa'²·Σb'²), exact
    *     integral division in DECIMAL(38,0). Monotone in |ρ|, so
    *     thresholding is unchanged. (Σa'b')²·1e6 holds under DECIMAL(38)
    *     while n ≲ 1.4e5 rows (Σa'b' ≤ n³) — audit a hash-sample past
    *     that, or quantize ranks to per-mille before centering (loses
    *     tie resolution, gains ~1e9-row headroom), stated.
    * NULL in either signal drops the row (no rank, no evidence).
    *
    * @return one row: (n_rows, sign, rho2_ppm). */
  def spearman(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    def rank2(c: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .select(col(c),
          (coalesce(sum(col("cnt")).over(w), lit(0L)) * 2
            + col("cnt") + 1).as(s"r2$c"))
    }
    val n1 = base.agg(count(lit(1)).as("n"))
    base
      .join(broadcast(rank2("a")), "a")
      .join(broadcast(rank2("b")), "b")
      .crossJoin(broadcast(n1))
      .select(col("n"), (col("r2a") - (col("n") + 1)).as("ca"),
        (col("r2b") - (col("n") + 1)).as("cb"))
      .groupBy("n")
      .agg(
        sum(expr("CAST(ca * cb AS DECIMAL(38,0))")).as("sab"),
        sum(expr("CAST(ca * ca AS DECIMAL(38,0))")).as("sa2"),
        sum(expr("CAST(cb * cb AS DECIMAL(38,0))")).as("sb2"))
      .select(col("n").as("n_rows"),
        when(col("sab") > 0, 1).when(col("sab") < 0, -1).otherwise(0)
          .cast("int").as("sign"),
        // a constant signal has zero rank variance: correlation is
        // undefined — NULL, never a fake 0 (the x25 stance)
        when(col("sa2") === 0 || col("sb2") === 0, lit(null))
          .otherwise(expr(
            "CAST((sab * sab * 1000000) DIV (sa2 * sb2) AS BIGINT)"))
          .as("rho2_ppm"))
  }
}
