package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-confidence calibration report — the reliability diagram +
  * expected calibration error (Naeini et al. 2015 "Obtaining Well
  * Calibrated Probabilities Using Bayesian Binning"; the binned ECE is
  * the standard estimator) for any scored-and-labeled frame. A data
  * pipeline that GATES on classifier confidence (language-ID admission,
  * quality-score thresholds, toxicity filters) is implicitly trusting
  * that confidence as a probability; this report is the audit that says
  * whether a 0.9 means 90%. Miscalibrated bins are where a fixed
  * admission threshold silently over- or under-collects.
  *
  * Everything is integer millionths: confidences arrive as ppm, bins are
  * equal-width over [0, 1e6] (the top edge folds into the last bin),
  * per-bin mean confidence and accuracy are floor-divided exact sums,
  * and ECE is the doc-weighted gap sum — order-free and
  * engine-replayable, no float accumulation anywhere.
  *
  * 100 TB shape: one scan of the scored frame into a `bins`-key groupBy
  * (map-side combined — the exchange is at most `bins` rows per task),
  * then the ECE is a 1-row aggregate of the bin table cross-joined back.
  * The corpus never shuffles on anything wider than the bin id.
  */
object Calibration {

  /** @param scored     one row per scored item
    * @param confPpmCol integer confidence in [0, 1e6] (millionths)
    * @param correctCol boolean — prediction matched the label
    * @param bins       number of equal-width reliability bins */
  def report(
      scored: DataFrame,
      confPpmCol: String,
      correctCol: String,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val per = scored
      .select(
        least(expr(s"(CAST($confPpmCol AS BIGINT) * $bins) div 1000000"),
          lit(bins - 1L)).as("bin"),
        col(confPpmCol).cast("long").as("c"),
        when(col(correctCol), 1L).otherwise(0L).as("ok"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("c")).as("sum_conf"),
        sum(col("ok")).as("n_correct"))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        expr("sum_conf div n_docs").as("mean_conf_ppm"),
        expr("(CAST(1000000 AS BIGINT) * n_correct) div n_docs").as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("mean_conf_ppm") - col("acc_ppm")))
      // ≤`bins` rows, read by BOTH output branches (the report and the
      // ECE aggregate) — without this the ECE branch re-scans the corpus
      .persist()
    val ece = per
      .agg(sum(col("n_docs")).as("nn"),
        sum(col("n_docs") * col("gap_ppm")).as("wg"))
      .select(expr("wg div nn").as("ece_ppm"))
    per.crossJoin(broadcast(ece))
  }
}
