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
}
