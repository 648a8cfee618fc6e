package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — a confidence interval for a corpus
  * mean computed in ONE distributed pass, with zero randomness at run
  * time. "The average document quality moved from 512 to 534" is only a
  * finding if 22 exceeds the metric's own sampling noise; the bootstrap
  * is the standard answer, and the classic obstacle to running it in a
  * data engine — per-row random resampling — disappears under the repo's
  * portable-hash discipline.
  *
  * == Poisson bootstrap (Chamandy et al. 2012, "Estimating Uncertainty
  * for Massive Data Streams") ==
  *
  * Resampling n rows WITH replacement ≈ giving each row an independent
  * Poisson(1) replicate count — no global coordination, so replica b's
  * weight for row i is a pure function of (i, b): a PolyHash bucket in
  * [0, 1000) read through the Poisson(1) pmf quantized to per-mille cells
  * (368/368/184/61/15/3/1 for counts 0..6 — exact to the 1e-3 the bucket
  * resolution carries; the stated contract, same class as the repo's
  * integer-millionth quantizations). Every engine, retry, and
  * partitioning draws the identical resample.
  *
  * == Shape ==
  *
  * One generate (B weights per row, scan-local) → one groupBy(replica)
  * over INTEGER sums (map-side combine reduces each task to ≤B cells, so
  * the exchange carries |tasks|·B rows whatever the corpus weighs) → a
  * B-row table on which the percentile bounds are exact. Replica means
  * are floor(1e6·Σwx / Σw) — a ratio of two integer sums, order-free and
  * bit-replayable where a float mean is neither.
  */
object Bootstrap {

  /** Per-mille cumulative Poisson(1) pmf: P(X=k) for k = 0..6 quantized
    * to 368/368/184/61/15/3/1 (sums to 1000). */
  private val cum = Seq(368L, 736L, 920L, 981L, 996L, 999L)

  private def poissonWeight(bucket: Column): Column =
    cum.zipWithIndex.foldRight(lit(6L): Column) { case ((th, k), els) =>
      when(bucket < th, lit(k.toLong)).otherwise(els)
    }

  /** Bootstrap CI for the mean of `metricCol` (an INTEGER column — keep
    * it quantized upstream, the repo-wide discipline). Returns one row:
    * n_rows, the point mean, and the (lo, hi) percentile bounds over
    * `replicas` resample means, all in integer millionths.
    *
    * @param loPct/hiPct  percentile bounds in per-mille (25 = 2.5%) —
    *   applied as exact percentile_disc over the replica means, so with
    *   small B the bound is a conservative order statistic, stated. */
  def meanCi(
      rows: DataFrame,
      idCol: String,
      metricCol: String,
      replicas: Int = 40,
      loPct: Int = 25,
      hiPct: Int = 975,
      salt: String = ""
  ): DataFrame = {
    require(replicas >= 2 && replicas <= 1000,
      s"replicas must be in [2, 1000], got $replicas")
    // replica -1 is the POINT estimate riding the same pass: weight 1 for
    // every row, so its "mean" is the unweighted corpus mean and its Σw is
    // n_rows — the whole query is ONE corpus scan + one ≤(B+1)-key
    // exchange, not a separate aggregate per statistic
    val weights = rows.select(
      col(metricCol).cast("long").as("x"),
      explode(transform(sequence(lit(-1), lit(replicas - 1)), b => {
        val bucket = graft.expressions.PolyHash(concat(
          lit(s"boot$salt|"), b.cast("string"), lit("|"),
          col(idCol).cast("string"))) % 1000
        struct(b.as("b"),
          when(b === -1, lit(1L)).otherwise(poissonWeight(bucket)).as("w"))
      })).as("r"))
    val sums = weights
      .groupBy(col("r.b").as("b"))
      .agg(sum(col("r.w") * col("x")).as("wx"), sum(col("r.w")).as("w"))
      // an (astronomically unlikely) all-zero-weight replica has no mean;
      // NULL would poison percentile_disc's ordering differently per
      // engine, so it is dropped, stated
      .filter(col("w") > 0)
      // integer millionths via long DIV — exact while Σw·x < 9.2e12 per
      // replica (x21's documented long-overflow contract; past that, cast
      // wx through DECIMAL(38,0) and divide there)
      .select(col("b"), col("w"),
        expr("CAST((wx * 1000000) DIV w AS BIGINT)").as("mean_ppm"))
      .persist()
    val perReplica = sums.filter(col("b") >= 0).select(col("mean_ppm"))
    val point = sums.filter(col("b") === -1)
      .select(col("w").cast("long").as("n_rows"), col("mean_ppm"))
    val lo = loPct / 1000.0
    val hi = hiPct / 1000.0
    val ci = perReplica.agg(
      count(lit(1)).as("n_replicas"),
      // Spark's percentile_disc returns DOUBLE even over longs; the value
      // is an order statistic of exact longs, so the cast back is lossless
      expr(s"CAST(percentile_disc($lo) WITHIN GROUP (ORDER BY mean_ppm) AS BIGINT)")
        .as("ci_lo_ppm"),
      expr(s"CAST(percentile_disc($hi) WITHIN GROUP (ORDER BY mean_ppm) AS BIGINT)")
        .as("ci_hi_ppm"))
    point.crossJoin(ci) // both sides are 1-row aggregates
  }

  /** Per-GROUP bootstrap CIs from the same single pass — the sliced
    * evaluation report ("which sources moved, beyond their own noise")
    * that turns per-source metric deltas into findings. Identical
    * resampling contract to [[meanCi]]: replica b's weight for row i is
    * the pure (i, b) hash — independent of the group, so a row keeps the
    * same resample fate however the slicing changes — and the point
    * estimate rides as weight-1 replica −1. The exchange carries at most
    * |tasks|·(B+1)·|groups| integer cells; the percentile order
    * statistics run per group on the |groups|·B-row table, and point
    * joins CI on the group key (broadcast — both sides are group-scale).
    * Use where per-group n is large enough that ±1/√n matters less than
    * the decision; tiny slices get honest WIDE intervals, which is the
    * point. */
  def meanCiByGroup(
      rows: DataFrame,
      idCol: String,
      metricCol: String,
      groupCol: String,
      replicas: Int = 40,
      loPct: Int = 25,
      hiPct: Int = 975,
      salt: String = ""
  ): DataFrame = {
    require(replicas >= 2 && replicas <= 1000,
      s"replicas must be in [2, 1000], got $replicas")
    val weights = rows.select(
      col(groupCol).as("g"),
      col(metricCol).cast("long").as("x"),
      explode(transform(sequence(lit(-1), lit(replicas - 1)), b => {
        val bucket = graft.expressions.PolyHash(concat(
          lit(s"boot$salt|"), b.cast("string"), lit("|"),
          col(idCol).cast("string"))) % 1000
        struct(b.as("b"),
          when(b === -1, lit(1L)).otherwise(poissonWeight(bucket)).as("w"))
      })).as("r"))
    val sums = weights
      .groupBy(col("g"), col("r.b").as("b"))
      .agg(sum(col("r.w") * col("x")).as("wx"), sum(col("r.w")).as("w"))
      .filter(col("w") > 0)
      .select(col("g"), col("b"), col("w"),
        expr("CAST((wx * 1000000) DIV w AS BIGINT)").as("mean_ppm"))
      .persist()
    val lo = loPct / 1000.0
    val hi = hiPct / 1000.0
    val ci = sums.filter(col("b") >= 0)
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_replicas"),
        expr(s"CAST(percentile_disc($lo) WITHIN GROUP (ORDER BY mean_ppm) AS BIGINT)")
          .as("ci_lo_ppm"),
        expr(s"CAST(percentile_disc($hi) WITHIN GROUP (ORDER BY mean_ppm) AS BIGINT)")
          .as("ci_hi_ppm"))
    val point = sums.filter(col("b") === -1)
      .select(col("g"), col("w").cast("long").as("n_rows"), col("mean_ppm"))
    point.join(broadcast(ci), Seq("g"))
      .withColumnRenamed("g", groupCol)
  }

  /** Bootstrap CI on the DIFFERENCE between two slices' means — the A/B
    * verdict ("did the new crawl change quality, beyond noise?") that
    * per-slice intervals can't give: overlapping slice CIs do NOT imply
    * an insignificant difference. Because the resample universe is
    * shared ([[meanCiByGroup]]'s group-independent (i, b) hash), the
    * difference is computed WITHIN each replica — mean_a(b) − mean_b(b)
    * — and the percentile bounds are exact order statistics over those B
    * integer differences; a replica where either side drew zero weight
    * carries no evidence for the difference and is dropped (stated, the
    * all-zero-replica contract one level up). Returns one row:
    * (n_a, n_b, mean_a_ppm, mean_b_ppm, delta_ppm, n_replicas,
    * ci_lo_ppm, ci_hi_ppm) — a CI excluding 0 is the "real change"
    * verdict. Same single-pass shape as the grouped CI, filtered to the
    * two slices before the generate. */
  def deltaCi(
      rows: DataFrame,
      idCol: String,
      metricCol: String,
      groupCol: String,
      groupA: String,
      groupB: String,
      replicas: Int = 40,
      loPct: Int = 25,
      hiPct: Int = 975,
      salt: String = ""
  ): DataFrame = {
    require(groupA != groupB, "groupA and groupB must differ")
    val two = rows.filter(col(groupCol).isin(groupA, groupB))
    val weights = two.select(
      (col(groupCol) === groupA).as("isA"),
      col(metricCol).cast("long").as("x"),
      explode(transform(sequence(lit(-1), lit(replicas - 1)), b => {
        val bucket = graft.expressions.PolyHash(concat(
          lit(s"boot$salt|"), b.cast("string"), lit("|"),
          col(idCol).cast("string"))) % 1000
        struct(b.as("b"),
          when(b === -1, lit(1L)).otherwise(poissonWeight(bucket)).as("w"))
      })).as("r"))
    val sums = weights
      .groupBy(col("isA"), col("r.b").as("b"))
      .agg(sum(col("r.w") * col("x")).as("wx"), sum(col("r.w")).as("w"))
      .filter(col("w") > 0)
      .select(col("isA"), col("b"), col("w"),
        expr("CAST((wx * 1000000) DIV w AS BIGINT)").as("mean_ppm"))
      .persist()
    val byB = sums
      .groupBy(col("b"))
      .agg(
        max(when(col("isA"), col("mean_ppm"))).as("ma"),
        max(when(!col("isA"), col("mean_ppm"))).as("mb"),
        max(when(col("isA"), col("w"))).as("na"),
        max(when(!col("isA"), col("w"))).as("nb"))
      .filter(col("ma").isNotNull && col("mb").isNotNull)
      .select(col("b"), col("na"), col("nb"), (col("ma") - col("mb")).as("d"))
    val point = byB.filter(col("b") === -1)
      .select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("d").as("delta_ppm"))
    val pointMeans = sums.filter(col("b") === -1)
      .groupBy()
      .agg(
        max(when(col("isA"), col("mean_ppm"))).as("mean_a_ppm"),
        max(when(!col("isA"), col("mean_ppm"))).as("mean_b_ppm"))
    val lo = loPct / 1000.0
    val hi = hiPct / 1000.0
    val ci = byB.filter(col("b") >= 0).agg(
      count(lit(1)).as("n_replicas"),
      expr(s"CAST(percentile_disc($lo) WITHIN GROUP (ORDER BY d) AS BIGINT)")
        .as("ci_lo_ppm"),
      expr(s"CAST(percentile_disc($hi) WITHIN GROUP (ORDER BY d) AS BIGINT)")
        .as("ci_hi_ppm"))
    point.crossJoin(pointMeans).crossJoin(ci) // all 1-row aggregates
  }

  /** Bootstrap CI on a PAIRED difference — two metrics measured on the
    * SAME rows (quality before vs after a transform, tokens under two
    * tokenizers), where [[deltaCi]]'s two-slice form is wrong: there the
    * sides resample independently; here each resampled row carries BOTH
    * measurements, so per-row correlation tightens the interval exactly
    * as a paired t-test tightens an unpaired one. Mechanically it IS
    * [[meanCi]] on the difference column — each replica's statistic is
    * mean_b(a−b) = mean_b(a) − mean_b(b) over one shared resample — the
    * wrapper exists because choosing paired vs independent resamples is
    * a design decision worth a named surface (and a mis-pick is silent:
    * both return plausible intervals). Returns one row: (n_rows,
    * mean_a_ppm, mean_b_ppm, delta_ppm, n_replicas, ci_lo_ppm,
    * ci_hi_ppm); a CI excluding 0 is the verdict.
    *
    * Division contract, stated: per-replica means ride [[meanCi]]'s
    * integral DIV, which truncates toward zero — DuckDB's `//` does
    * too (verified: -7 // 2 = -3), so negative replica sums replay
    * exactly; only an oracle written with floor-semantics division
    * (e.g. FLOOR(a / b) over floats) would diverge on negatives. The
    * shipped query orients the pair non-negative anyway (bytes REMOVED
    * by a scrub) — the less sign-trapped framing, not a correctness
    * requirement. */
  def pairedDeltaCi(
      rows: DataFrame,
      idCol: String,
      metricACol: String,
      metricBCol: String,
      replicas: Int = 40,
      loPct: Int = 25,
      hiPct: Int = 975,
      salt: String = ""
  ): DataFrame = {
    val withDiff = rows.select(col(idCol),
      col(metricACol).cast("long").as("xa"),
      col(metricBCol).cast("long").as("xb"))
    val ci = meanCi(
      withDiff.withColumn("xd", col("xa") - col("xb")),
      idCol, "xd", replicas, loPct, hiPct, salt)
      .select(col("n_rows"), col("mean_ppm").as("delta_ppm"),
        col("n_replicas"), col("ci_lo_ppm"), col("ci_hi_ppm"))
    val pointMeans = withDiff.agg(
      expr("CAST((SUM(xa) * 1000000) DIV COUNT(*) AS BIGINT)").as("mean_a_ppm"),
      expr("CAST((SUM(xb) * 1000000) DIV COUNT(*) AS BIGINT)").as("mean_b_ppm"))
    ci.crossJoin(pointMeans) // both 1-row aggregates
      .select(col("n_rows"), col("mean_a_ppm"), col("mean_b_ppm"),
        col("delta_ppm"), col("n_replicas"), col("ci_lo_ppm"), col("ci_hi_ppm"))
  }
}
