package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Reference-trained bigram language model — the CCNet-style quality
  * gate (Wenzek et al. 2020: fit a small LM on a trusted reference
  * corpus, score each crawled document against it, split the crawl
  * into head/middle/tail by model agreement).
  *
  * This differs from x14's in-corpus LM in exactly the way that
  * matters at 100 TB: the model is a FIXED, vocabulary-bounded
  * artifact (a few MB — same storage class as x17's quantile sketches
  * or e14's codebooks) fit ONCE on the curated reference slice.
  * Scoring a new crawl is then one LEFT join of the crawl's bigram
  * stream against that table — broadcastable when the vocabulary
  * fits, sort-merge on the constant-width `bg` key otherwise — and
  * the reference is never rescanned; the target corpus contributes
  * no counts, so admission decisions are stable as the crawl grows.
  *
  * Probabilities follow the repo's integer-millionth discipline
  * (floor(1e6·P) — see x14's rationale): per-doc scores are INTEGER
  * sums, order-free and engine-exact, where a float log-prob sum is
  * neither. At real scale you'd sum log-space doubles and accept
  * approximate comparison; the quantization costs <1e-6 per
  * transition and buys the hash oracle.
  *
  * Reference analog: SmartPipeline's enrichment stages
  * (examples/custom_stage.py-style per-record scoring against a
  * loaded model) — here the "loaded model" is a joined table, not
  * per-worker state.
  */
object Lm {

  /** Fit the conditional table: one row per reference bigram,
    * `scaled = floor(1e6 · C(ab) / C(a·))` where C(a·) counts
    * occurrences whose FIRST word is `a` — conditionals sum to ~1 per
    * left word. Two map-side-combined aggregates; output cardinality
    * is the reference's distinct-bigram count (vocabulary-bounded),
    * independent of how much data it will later score. Persist this
    * as the stored artifact at scale. */
  def fitBigram(ref: DataFrame, textCol: String = "text"): DataFrame = {
    val cnt = ref
      .select(explode(shingles(words(col(textCol)), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cab"))
    val fst = cnt
      .withColumn("a", substring_index(col("bg"), " ", 1))
      .groupBy("a").agg(sum(col("cab")).as("ca"))
    cnt.withColumn("a", substring_index(col("bg"), " ", 1))
      .join(fst, "a")
      .select(col("bg"),
        floor(col("cab") * lit(1000000L) / col("ca")).cast("long").as("scaled"))
  }

  /** Per-document score against a fitted model — the bucket-free half of
    * [[perplexityBuckets]], also what [[fitThresholds]] consumes.
    * Out-of-vocabulary transitions back off to scaled=1 (one
    * millionth — the floor any in-model transition can also hit), so
    * unseen text degrades the mean instead of nulling it. Documents
    * with fewer than two words have no transitions and are excluded
    * (no evidence either way — gate them on length upstream, d23).
    *
    * `mean_scaled = floor(sum/n)` stays exact while `sum_scaled`
    * < 2^53 (a 9e9-transition document — not a document). */
  def score(
      target: DataFrame,
      lm: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val occ = target.select(col(idCol),
      explode(shingles(words(col(textCol)), 2)).as("bg"))
    occ.join(lm, Seq("bg"), "left")
      .select(col(idCol), coalesce(col("scaled"), lit(1L)).as("s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_scaled"))
      .withColumn("mean_scaled",
        floor(col("sum_scaled") / col("n_bigrams")).cast("long"))
  }

  /** Score a target corpus against a fitted model and bucket it:
    * head ≥ headMin > middle ≥ midMin > tail. */
  def perplexityBuckets(
      target: DataFrame,
      lm: DataFrame,
      headMin: Long,
      midMin: Long,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(headMin > midMin, s"headMin ($headMin) must exceed midMin ($midMin)")
    score(target, lm, textCol, idCol)
      .withColumn("bucket",
        when(col("mean_scaled") >= headMin, "head")
          .when(col("mean_scaled") >= midMin, "middle")
          .otherwise("tail"))
  }

  /** Fit the gate THRESHOLDS from the scored reference's own distribution
    * — the step that turns a calibrated constant into a stored artifact:
    * at 100 TB the reference slice is scored once (or a hash-sample of
    * it), the two discrete quantiles are persisted beside the LM table,
    * and every later crawl is gated by the SAME stored pair, so admission
    * policy doesn't drift with the crawl.
    *
    * Quantile definition is DISCRETE and integer-exact so both engines
    * replay it bit-for-bit (interpolating quantiles are float-assoc-
    * dependent): q(p) = min{ m : cum(m)·1e6 ≥ p·n }, computed over the
    * distinct-mean histogram (the cum-sum window runs on |distinct
    * means| rows — bounded by the score quantization, not the corpus;
    * `cum·1e6` needs n < 2^43 reference docs, far past any sample you'd
    * fit on). Returns one row (head_min, mid_min). Degenerate
    * distributions (all means equal, or an empty slice) fall back to
    * (2, 1): every doc lands in one well-defined bucket and the gate
    * stays total rather than failing the require in
    * [[perplexityBuckets]]. */
  def fitThresholds(
      scored: DataFrame,
      midMillionths: Long = 250000L,
      headMillionths: Long = 750000L
  ): DataFrame = {
    require(0 < midMillionths && midMillionths < headMillionths
      && headMillionths <= 1000000L,
      s"need 0 < mid ($midMillionths) < head ($headMillionths) <= 1e6")
    val byMean = scored.groupBy("mean_scaled").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_scaled"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byMean.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(byMean.agg(sum(col("c")).as("n"))))
      .agg(
        min(when(col("cum") * 1000000L >= col("n") * headMillionths,
          col("mean_scaled"))).as("h"),
        min(when(col("cum") * 1000000L >= col("n") * midMillionths,
          col("mean_scaled"))).as("m"))
      .select(
        when(col("h").isNull || col("m").isNull || col("h") <= col("m"),
          lit(2L)).otherwise(col("h")).cast("long").as("head_min"),
        when(col("h").isNull || col("m").isNull || col("h") <= col("m"),
          lit(1L)).otherwise(col("m")).cast("long").as("mid_min"))
  }

  /** Fit LM + thresholds on the reference slice and persist both as the
    * stored gate artifact (`path/lm`, `path/thresholds`) — the storage
    * class of x17's sketches / e14's codebooks: written once by the fit
    * job, read by every later scoring run. */
  def fitAndStoreGate(
      ref: DataFrame,
      path: String,
      midMillionths: Long = 250000L,
      headMillionths: Long = 750000L,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): Unit = {
    val lm = fitBigram(ref.select(col(textCol)), textCol)
    lm.write.mode("overwrite").parquet(s"$path/lm")
    val stored = ref.sparkSession.read.parquet(s"$path/lm")
    fitThresholds(score(ref, stored, textCol, idCol),
      midMillionths, headMillionths)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/thresholds")
  }

  /** Gate-health monitor + refit decision — the mechanism that makes
    * "refit the admission policy DELIBERATELY" operational instead of
    * aspirational. The stored thresholds were fit as the reference
    * slice's q25/q75; if the incoming crawl matched that distribution,
    * the same discrete quantiles fit on the CRAWL's scores would land
    * near the stored pair and the bucket shares near 25/50/25. This
    * report computes both drift signals from one scored pass and turns
    * them into a decision: `refit = true` when either crawl quantile
    * moved more than `tolPpm` (relative, integer millionths) from its
    * stored threshold. The x19 pattern (compare live distribution to a
    * stored reference) applied to the gate's own admission artifact.
    *
    * One corpus scan (the scoring pass, persisted — two metadata-sized
    * branches read it: the 1-row share aggregate and the distinct-mean
    * quantile fit); everything downstream is planner-scale. All integer
    * arithmetic, so the decision itself hash-replays. Relative moves
    * use DIV against max(stored, 1) — quantiles are ≥ 1 by
    * construction, so the division is total and non-negative. */
  def gateDriftReport(
      spark: org.apache.spark.sql.SparkSession,
      crawl: DataFrame,
      path: String,
      tolPpm: Long = 200000L,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(tolPpm > 0, s"tolPpm must be positive, got $tolPpm")
    val lm = spark.read.parquet(s"$path/lm")
    val thr = spark.read.parquet(s"$path/thresholds").head()
    val headMin = thr.getAs[Long]("head_min")
    val midMin = thr.getAs[Long]("mid_min")
    val scored = score(crawl, lm, textCol, idCol).persist()
    val shares = scored.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("mean_scaled") >= headMin, 1L).otherwise(0L)).as("nh"),
      sum(when(col("mean_scaled") >= midMin
        && col("mean_scaled") < headMin, 1L).otherwise(0L)).as("nm"))
      .select(col("n_docs"),
        expr("(1000000 * nh) DIV n_docs").as("head_share_ppm"),
        expr("(1000000 * nm) DIV n_docs").as("mid_share_ppm"),
        expr("(1000000 * (n_docs - nh - nm)) DIV n_docs").as("tail_share_ppm"))
    val crawlQ = fitThresholds(scored)
      .select(col("head_min").as("crawl_head_q"),
        col("mid_min").as("crawl_mid_q"))
    val report = shares.crossJoin(crawlQ) // both 1-row aggregates
      .withColumn("head_min_stored", lit(headMin))
      .withColumn("mid_min_stored", lit(midMin))
      .withColumn("head_move_ppm",
        expr(s"(1000000 * abs(crawl_head_q - $headMin))"
          + s" DIV greatest(CAST($headMin AS BIGINT), 1)"))
      .withColumn("mid_move_ppm",
        expr(s"(1000000 * abs(crawl_mid_q - $midMin))"
          + s" DIV greatest(CAST($midMin AS BIGINT), 1)"))
      .withColumn("refit",
        col("head_move_ppm") > tolPpm || col("mid_move_ppm") > tolPpm)
    // materialize the 1-row verdict EAGERLY so the corpus-scale scored
    // cache can be released before returning — a lazily-returned report
    // would otherwise pin corpus-scale blocks for the session lifetime
    // (every other caching operator here releases inside its call)
    val rows = report.collectAsList()
    val schema = report.schema
    scored.unpersist()
    spark.createDataFrame(rows, schema)
  }

  /** Score + bucket a crawl through a stored gate artifact. The two
    * threshold scalars are planner-scale metadata (one stored row). */
  def gateWithStored(
      spark: org.apache.spark.sql.SparkSession,
      target: DataFrame,
      path: String,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val lm = spark.read.parquet(s"$path/lm")
    val thr = spark.read.parquet(s"$path/thresholds").head()
    perplexityBuckets(target, lm,
      thr.getAs[Long]("head_min"), thr.getAs[Long]("mid_min"),
      textCol, idCol)
  }
}
