package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flat-ADC PQ scan (`Similarity.pqTopK` — FAISS-IndexPQ capability
  * parity) as the CALIBRATION BASELINE for the IVFADC scale path, its
  * round-12 home after e06_ann_pq was retired from the query registry:
  * per-query work is linear in the corpus by definition (every code is
  * ADC-scored), which makes it a recall yardstick rather than a 100 TB
  * search path — e09/e14 (cell-probed candidates, constant-work refine)
  * are what actually runs at scale. This spec keeps both halves of the
  * retired query's contract: the absolute recall floor on the shared
  * codebooks, and the baseline inequality that the cell-probed search
  * cannot collapse relative to the flat scan it approximates. */
class PqBaselineSpec extends SparkSpec {

  private def recallAt3(ann: DataFrame, truth: DataFrame): Double = {
    val hits = ann.select("q_id", "neighbor_id")
      .join(truth.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"))
      .count()
    hits.toDouble / truth.count()
  }

  test("flat-ADC recall floor holds and calibrates the IVFADC scale path") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 50)
    val truth = Similarity.bruteForceTopK(emb, qs, k = 3)
    val pqFit = Similarity.fitPqCodebooks(emb, m = 8, ks = 32)
    val coarse = Similarity.fitCoarseQuantizer(emb, nCentroids = 0)

    // the retired query's oracle bar (0.6), with the measured sf0.001
    // operating point at 0.907 — generous to KMeans-init jitter, far
    // above a broken encoder/ADC table
    val pqRecall = recallAt3(
      Similarity.pqTopK(emb, qs, k = 3, m = 8, ks = 32, refine = 8,
        fitted = Some(pqFit)), truth)
    assert(pqRecall >= 0.6, f"flat-ADC recall@3 $pqRecall%.3f below the 0.6 bar")

    // calibration inequality: cell probing prunes candidates BEFORE the
    // same ADC ranking, so the scale path may trade a bounded amount of
    // recall for its constant per-query work — but a collapse vs the
    // flat baseline means broken probing, not an acceptable trade
    // (measured 0.973 vs 0.907 at sf0.001: the bigger refine budget
    // currently more than pays back the pruning loss)
    val ivfRecall = recallAt3(
      Similarity.ivfPqTopK(emb, qs, k = 3,
        nCentroids = 0, nProbe = 0, m = 8, ks = 32, refine = 48,
        residual = false, coarseFitted = Some(coarse), fitted = Some(pqFit)),
      truth)
    assert(ivfRecall >= pqRecall - 0.2,
      f"IVFADC recall $ivfRecall%.3f collapsed vs flat-ADC baseline $pqRecall%.3f")
  }
}
