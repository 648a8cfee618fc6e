package graft.operators

import graft.expressions.QSketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-drift gating against a STORED reference sketch — the
  * monitoring shape an ingest pipeline runs continuously: the reference
  * distribution (last release, golden corpus) is sketched ONCE into a
  * few-KB artifact; every new batch sketches itself (one pass, mergeable
  * partials) and compares its quantiles against the reference's. History
  * is never rescanned, and the per-batch cost is the batch's own scan.
  *
  * The verdict is a relative-value gate per probed quantile:
  * |q_batch − q_ref| > tolerance · max(|q_ref|, 1e-12). For an exact
  * rank-space statistic between two MATERIALIZED slices, use x11's
  * integer Kolmogorov–Smirnov query — this operator is the cheap online
  * gate, x11 the offline attribution tool.
  *
  * Reference: SmartPipeline has no distribution monitoring; this extends
  * the curation-gate family (d38) to the value-distribution axis.
  */
object Drift {

  /** Sketch `valueCol` into a one-row parquet artifact at `path`. */
  def writeReferenceSketch(
      values: DataFrame, valueCol: String, eps: Double, path: String): Unit =
    values.agg(QSketch.sketchAgg(col(valueCol), eps).as("sk"))
      .write.mode("overwrite").parquet(path)

  /** Load the stored artifact's bytes (driver-side, a few KB). */
  def loadReferenceSketch(spark: SparkSession, path: String): Array[Byte] =
    spark.read.parquet(path).select("sk").head().getAs[Array[Byte]](0)

  /** One row per probed quantile for this batch:
    * (p, ref_q, batch_q, n_vals, drifted). The reference sketch ships as a
    * literal in the plan (few KB — task-closure size class, same as the
    * LSH plane matrices); the batch sketch is ONE map-side-combined
    * aggregate over the batch scan, so the whole verdict costs one pass
    * and no shuffle beyond the single-row final agg. The batch sketch is
    * built at the REFERENCE's eps — mixing resolutions would move the
    * comparison's error budget silently.
    *
    * An EMPTY (or all-null) batch has no quantiles: `batch_q` comes back
    * NULL and the raw comparison would be NULL too — a streaming consumer
    * checking `drifted == true` would silently treat that as non-drifted
    * with no explicit verdict. The verdict is therefore coalesced to an
    * explicit `false` ("no evidence of drift"), and `n_vals = 0` is the
    * signal that the verdict is vacuous rather than earned — gate on
    * `n_vals >= minBatch` upstream if empty micro-batches should alarm. */
  def driftVerdicts(
      batch: DataFrame,
      refSketch: Array[Byte],
      probs: Seq[Double] = Seq(0.5, 0.95),
      tolerance: Double = 0.1,
      valueCol: String = "value"): DataFrame = {
    require(probs.nonEmpty, "driftVerdicts: probs must be non-empty")
    val eps = QSketch.deserialize(refSketch).relativeError
    val sk = batch.agg(
      QSketch.sketchAgg(col(valueCol), eps).as("sk"),
      count(col(valueCol)).as("n_vals"))
    val perProb = array(probs.map { p =>
      val refQ = QSketch.query(lit(refSketch), p)
      val batchQ = QSketch.query(col("sk"), p)
      struct(lit(p).as("p"), refQ.as("ref_q"), batchQ.as("batch_q"),
        coalesce(abs(batchQ - refQ) >
          lit(tolerance) * greatest(abs(refQ), lit(1e-12)),
          lit(false)).as("drifted"))
    }: _*)
    sk.select(col("n_vals"), explode(perProb).as("v"))
      .select(col("v.p"), col("v.ref_q"), col("v.batch_q"),
        col("n_vals"), col("v.drifted"))
  }

  /** CATEGORICAL drift — the family's third axis beside the quantile gate
    * above (continuous, online) and x11's KS (continuous, offline): total
    * variation distance between each group's category distribution and a
    * reference slice's, TVD = ½ Σ_cat |o/No − r/Nr|. The natural drift
    * metric for label/language/priority columns, where quantiles are
    * meaningless; bounded [0,1], interpretable as "the fraction of mass
    * that moved".
    *
    * EXACT integer arithmetic end to end (the x14/g02 discipline): the
    * per-category term is |o·Nr − r·No| (longs — exact up to ~3e9-row
    * slices, past that lift the products to DECIMAL), the final
    * normalization floor(1e6·S / (2·No·Nr)) runs in DECIMAL(38,0)
    * integral division, so the verdict replays bit-for-bit on any
    * engine or partitioning — no χ²'s float division, no G-test's libm
    * log. Categories absent on one side contribute their full mass
    * (full-outer grid vs the reference's category set).
    *
    * Shape: one groupBy over each side (map-side combined), a
    * |groups|×|categories| grid join (KB-scale — category columns are
    * low-cardinality by definition), one |grid| aggregate. The reference
    * distribution is a stored-artifact candidate like the quantile
    * sketch: persist `ref`'s (cat, r) table and Nr once, score every
    * later batch against it without rescanning.
    *
    * @return one row per group: (groupCol, n_current, tvd_millionths,
    *         drifted). Groups or references with zero mass are excluded
    *         (no distribution to compare — same no-evidence stance as
    *         the quantile gate's n_vals). */
  def categoricalDrift(
      ref: DataFrame,
      cur: DataFrame,
      catCol: String,
      groupCol: String,
      driftMillionths: Long = 20000L
  ): DataFrame =
    categoricalDriftAgainst(categoricalReference(ref, catCol),
      cur, catCol, groupCol, driftMillionths)

  /** The reference half of [[categoricalDrift]] as a separable (and
    * storable) artifact: the `(cat, r)` count table — |categories| rows,
    * KB-scale by definition. Persist once ([[writeCategoricalReference]]),
    * score every later batch against it without rescanning the reference
    * — the quantile gate's stored-sketch contract for the categorical
    * axis. */
  def categoricalReference(ref: DataFrame, catCol: String): DataFrame =
    ref.groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("r"))

  /** Persist the reference category distribution at `path`. */
  def writeCategoricalReference(
      ref: DataFrame, catCol: String, path: String): Unit =
    categoricalReference(ref, catCol)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** [[categoricalDrift]] against a prebuilt `(cat, r)` reference table
    * (in-memory or read back from [[writeCategoricalReference]]'s
    * artifact) — the steady-state scoring path; identical arithmetic. */
  def categoricalDriftAgainst(
      refCounts: DataFrame,
      cur: DataFrame,
      catCol: String,
      groupCol: String,
      driftMillionths: Long = 20000L
  ): DataFrame = {
    val r = refCounts
    val rt = r.agg(sum(col("r")).as("nr"))
    val c = cur.groupBy(col(groupCol).as("g"), col(catCol).as("cat"))
      .agg(count(lit(1)).as("o"))
    val ct = c.groupBy("g").agg(sum(col("o")).as("no"))
    // grid = every group × every reference category, so ref-only
    // categories contribute |0·Nr − r·No|; cur-only categories survive
    // the full outer join with r = 0
    val grid = ct.select("g").crossJoin(r)
    val ap = grid.join(c, Seq("g", "cat"), "full_outer")
      .select(col("g"), col("cat"),
        coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("o"), lit(0L)).as("o"))
    ap.join(ct, "g").crossJoin(broadcast(rt))
      .groupBy(col("g"), col("no"), col("nr"))
      .agg(sum(abs(col("o") * col("nr") - col("r") * col("no"))).as("s"))
      .filter(col("nr") > 0 && col("no") > 0)
      .select(col("g").as(groupCol), col("no").as("n_current"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * s)
          DIV (2 * CAST(no AS DECIMAL(38,0)) * nr) AS BIGINT)""")
          .as("tvd_millionths"))
      .withColumn("drifted", col("tvd_millionths") >= driftMillionths)
  }
}
