package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents whose n-gram distribution matches a
  * trusted TARGET corpus, scored by how much more likely each document
  * is under a target-trained LM than under a raw-trained LM. Where
  * [[Lm]]'s CCNet gate asks "is this document well-formed text?" (one
  * reference model, absolute agreement), DSIR asks the domain-transfer
  * question: "does it look like the data I want MORE than it looks like
  * the data I have?" — the two-model RATIO cancels features common to
  * both corpora and keeps what distinguishes the target.
  *
  * == Weight definition (the repo's integer-exact form) ==
  *
  * The paper's importance weight is log p_target(x) − log p_raw(x)
  * under hashed n-gram models. `ln` is libm-implementation-defined
  * (x04's rationale), so this engine keeps the repo's integer-millionth
  * conditionals ([[Lm.fitBigram]]'s floor(1e6·C(ab)/C(a·))) and scores
  * `weight_ppm = mean_t − mean_r`: the per-bigram average scaled
  * conditional under the target model minus the same under the raw
  * model. Positive ⇒ target-like, negative ⇒ raw-typical; both terms
  * are the exact integers [[Lm.score]] already pins, so the weight —
  * and therefore the selection — replays bit-for-bit on any engine,
  * retry, or partitioning. The deviation from the paper's log-ratio is
  * stated, not hidden: per-document ordering may differ from the
  * log-space rank when bigram likelihoods are wildly skewed WITHIN one
  * document; the mean-agreement form is the same statistic the x23 gate
  * already stakes its buckets on.
  *
  * == Selection ==
  *
  * Top-k by (weight DESC, doc_id) — the paper's deterministic top-k
  * variant (its §3 heuristic alternative to Gumbel-top-k sampling;
  * with quantized integer weights the Gumbel jitter would dominate
  * ties, and the repo's sampled-∝-size path already exists as d49's
  * πps draw for anyone who wants stochastic selection). Ties at the
  * budget boundary break on doc_id, so the selected SET is a pure
  * function of (corpora, k).
  *
  * == 100 TB shape ==
  *
  * Both models are vocabulary-bounded stored artifacts (the x17/e14
  * storage class), fit ONCE — the target corpus is small by definition
  * and the raw model needs only a hash-sample of the raw corpus. The
  * scoring pass is one bigram explode over the raw corpus with TWO
  * broadcastable left joins against the stored tables resolved in the
  * SAME pass (never two scans), one map-side-combined per-doc
  * aggregate, and a TakeOrderedAndProject top-k (per-partition heaps,
  * never a global sort). The raw corpus never shuffles on anything
  * wider than doc_id.
  *
  * Reference analog: SmartPipeline's model-scoring enrichment stages
  * (examples/custom_stage.py) — here the "loaded model" is two joined
  * tables and the selection is a distributed top-k, not per-worker
  * state.
  */
object Dsir {

  /** Per-document importance weights against two fitted bigram tables
    * (each `(bg, scaled)` — [[Lm.fitBigram]]'s output). One bigram
    * explode, both models joined in the same pass, one aggregate.
    * Out-of-vocabulary transitions back off to scaled=1 on BOTH sides
    * (Lm.score's contract), so a bigram unseen by either model
    * contributes 0 to the weight — exactly the common-feature
    * cancellation the ratio form is for. Documents with fewer than two
    * words have no transitions and are excluded, stated (gate on
    * length upstream, d23). */
  def importanceWeights(
      docs: DataFrame,
      targetLm: DataFrame,
      rawLm: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val occ = docs.select(col(idCol),
      explode(shingles(words(col(textCol)), 2)).as("bg"))
    occ
      .join(broadcast(targetLm.select(col("bg"), col("scaled").as("st"))),
        Seq("bg"), "left")
      .join(broadcast(rawLm.select(col("bg"), col("scaled").as("sr"))),
        Seq("bg"), "left")
      .select(col(idCol),
        coalesce(col("st"), lit(1L)).as("st"),
        coalesce(col("sr"), lit(1L)).as("sr"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("st")).as("sum_t"), sum(col("sr")).as("sum_r"))
      .select(col(idCol), col("n_bigrams"),
        floor(col("sum_t") / col("n_bigrams")).cast("long").as("mean_t"),
        floor(col("sum_r") / col("n_bigrams")).cast("long").as("mean_r"))
      .withColumn("weight_ppm", col("mean_t") - col("mean_r"))
  }

  /** The deterministic top-k selection over a weighted frame — budget
    * the admission at `k` documents. TakeOrderedAndProject: bounded
    * per-partition heaps, the driver sees k rows. */
  def selectTopK(weighted: DataFrame, k: Int, idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weighted.orderBy(col("weight_ppm").desc, col(idCol)).limit(k)
  }

  /** Fit both models and persist them as one stored selection artifact
    * (`path/target_lm`, `path/raw_lm`) — written once by the fit job,
    * read by every later admission run, so the selection policy is a
    * versioned artifact that never drifts with the crawl. At 100 TB
    * `raw` is a hash-sample of the raw corpus (the model only needs the
    * distribution, not the data). */
  def fitAndStore(
      target: DataFrame,
      raw: DataFrame,
      path: String,
      textCol: String = "text"
  ): Unit = {
    Lm.fitBigram(target.select(col(textCol)), textCol)
      .write.mode("overwrite").parquet(s"$path/target_lm")
    Lm.fitBigram(raw.select(col(textCol)), textCol)
      .write.mode("overwrite").parquet(s"$path/raw_lm")
  }

  /** Score a crawl through a stored selection artifact — the steady-
    * state admission path. */
  def weightsWithStored(
      spark: SparkSession,
      docs: DataFrame,
      path: String,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    importanceWeights(docs,
      spark.read.parquet(s"$path/target_lm"),
      spark.read.parquet(s"$path/raw_lm"),
      textCol, idCol)
}
