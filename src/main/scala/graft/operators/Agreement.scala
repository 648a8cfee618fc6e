package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Annotation aggregation and inter-annotator agreement — the
  * label-quality side of training-data curation (RLHF preference labels,
  * classification gold sets, eval-set adjudication): collapse redundant
  * human labels to one per item by majority vote, and score how much the
  * annotators actually agree (per-item, and corpus-level chance-corrected
  * kappa per Fleiss 1971), so a pipeline can route low-agreement items to
  * re-annotation instead of training on noise.
  *
  * Reference tie-in: the reference aggregates per-stage counters and error
  * rates (`pipeline.py` count/error surfaces) — this is the same
  * "trust-the-batch?" observability applied to labels rather than stages.
  *
  * Exactness discipline (the repo-wide rule): no floats cross an
  * aggregation boundary. Ratios are quantized to integer MILLIONTHS with
  * explicit floor division, and floor is spelled out via the non-negative
  * modulus — `(a - ((a mod b)+b) mod b) / b` — because Spark's `div` and
  * DuckDB's `//` both truncate toward zero, which disagrees with floor
  * exactly when a kappa numerator goes negative (poor agreement is a
  * legitimate, testable state). Chance agreement is computed from
  * label shares ALREADY quantized to millionths, so every intermediate
  * fits a long at any corpus size (Σ p_u² ≤ |labels|·10¹²) — no decimal
  * widening, no overflow cliff at 10⁹ annotations.
  *
  * Scale shape: everything is one groupBy chain on (item) / (item, label)
  * keys — map-side combined, AQE-skew-splittable, no window wider than an
  * item's label set (≤ |label vocabulary| rows per item, WindowGroupLimit-
  * pruned rank-1). The corpus-level pass reduces to |labels|-row and 1-row
  * aggregates; nothing driver-side scales with items.
  */
object Agreement {

  /** Exact floor division as a Column (works for negative `a`; `b` > 0). */
  def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** One label per (item, annotator): annotators sometimes submit twice —
    * keep the deterministic minimum so the reduction is engine/retry-stable
    * (same contract as d13's keep-best-representative). */
  def oneLabelPerAnnotator(
      ann: DataFrame, item: String, annotator: String, label: String
  ): DataFrame =
    ann.groupBy(col(item), col(annotator)).agg(min(col(label)).as(label))

  /** Per-item majority vote: `modal_label` (most votes, ties to the
    * lexicographically smallest label), `modal_votes`, `n_annotations`,
    * and `agreement_millionths` — the pairwise agreement
    * Σⱼ cⱼ(cⱼ−1) / (n(n−1)) (the per-item term of Fleiss' P̄), defined as
    * 10⁶ for single-annotation items (nothing to disagree with). */
  def majorityVote(ann: DataFrame, item: String, label: String): DataFrame = {
    val v = ann.groupBy(col(item), col(label)).agg(count(lit(1)).as("_c"))
    val it = v.groupBy(col(item)).agg(
      sum(col("_c")).as("n_annotations"),
      sum(col("_c") * (col("_c") - 1)).as("_pairs"))
    val w = Window.partitionBy(col(item))
      .orderBy(col("_c").desc, col(label).asc)
    val modal = v.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(item), col(label).as("modal_label"),
        col("_c").as("modal_votes"))
    it.join(modal, Seq(item))
      .withColumn("agreement_millionths",
        when(col("n_annotations") <= 1, lit(1000000L))
          .otherwise(floorDiv(lit(1000000L) * col("_pairs"),
            col("n_annotations") * (col("n_annotations") - 1))))
      .drop("_pairs")
  }

  /** Corpus-level Fleiss-style kappa over items with ≥ 2 annotations:
    * one row — `n_items`, `n_annotations`, `observed_millionths` (mean of
    * the per-item agreement terms, each floored to millionths first so the
    * mean is order-free), `chance_millionths` (Σ pⱼ² over millionth-
    * quantized label shares), and `kappa_millionths` =
    * ⌊10⁶·(P̄−Pₑ)/(10⁶−Pₑ)⌋ — NULL when Pₑ = 10⁶ (degenerate one-label
    * corpus: kappa undefined) or when no item qualifies. */
  def fleissKappa(ann: DataFrame, item: String, label: String): DataFrame = {
    val v = ann.groupBy(col(item), col(label)).agg(count(lit(1)).as("_c"))
    val it = v.groupBy(col(item)).agg(
      sum(col("_c")).as("n"),
      sum(col("_c") * (col("_c") - 1)).as("_pairs"))
      .filter(col("n") >= 2)
      .withColumn("agree_u", floorDiv(lit(1000000L) * col("_pairs"),
        col("n") * (col("n") - 1)))
    val s = it.agg(count(lit(1)).as("m"), sum(col("agree_u")).as("sa"),
      sum(col("n")).as("nn"))
    val cj = v.join(it.select(col(item)), Seq(item), "semi")
      .groupBy(col(label)).agg(sum(col("_c")).as("cj"))
    // label shares quantized BEFORE squaring: Σ p_u² ≤ |labels|·10¹² keeps
    // every intermediate in long range at any annotation volume
    val pe = cj.crossJoin(broadcast(s.select(col("nn"))))
      .select(floorDiv(lit(1000000L) * col("cj"), col("nn")).as("p_u"))
      .agg(sum(col("p_u") * col("p_u")).as("_s2"))
      .select(floorDiv(col("_s2"), lit(1000000L)).as("pe_u"))
    val pbar = floorDiv(col("sa"), col("m"))
    s.crossJoin(pe).select(
      col("m").as("n_items"),
      col("nn").as("n_annotations"),
      when(col("m") === 0, lit(null).cast("long"))
        .otherwise(pbar).as("observed_millionths"),
      when(col("m") === 0, lit(null).cast("long"))
        .otherwise(col("pe_u")).as("chance_millionths"),
      when(col("m") === 0 || col("pe_u") >= 1000000L, lit(null).cast("long"))
        .otherwise(floorDiv(lit(1000000L) * (pbar - col("pe_u")),
          lit(1000000L) - col("pe_u"))).as("kappa_millionths"))
  }

  /** BRADLEY–TERRY preference ranking (Bradley & Terry 1952) by the MM
    * algorithm (Hunter 2004) — the model behind RLHF preference
    * aggregation and arena-style leaderboards: from pairwise "i beat j"
    * counts, a strength s_i per item such that P(i beats j) =
    * s_i/(s_i+s_j). [[majorityVote]] collapses redundant labels on ONE
    * item; this aggregates comparisons ACROSS items into a ranking — the
    * other half of preference-label curation.
    *
    * MM update, made engine-deterministic the pageRank way: s_i ←
    * W_i / Σ_j m_ij/(s_i+s_j) (W_i = wins, m_ij = head-to-head count),
    * run for a FIXED round count in integer millionths — per-pair term
    * floor(m_ij·10¹² / (s_i+s_j)), update floor(W_i·10¹² / Σ) — so the
    * fit replays bit-for-bit on any engine/partitioning/retry.
    * Quantization: the 10¹² scale keeps per-term relative error under
    * ~10⁻⁵ at ppm-scale strengths; m_ij and W_i must stay ≤ ~9.2·10⁶ for
    * the long products (x21's documented overflow contract — cast
    * through DECIMAL(38,0) past that). A never-winning item's true MLE
    * is 0, which would zero-divide later rounds; scores floor at 1
    * (Lm's 1-millionth floor discipline), stated. No normalization —
    * BT is scale-invariant and a fixed anchor would add a join per
    * round; compare scores WITHIN one fit, stated.
    *
    * Scale shape: the pairwise-count table is the corpus-scale input
    * (built by the caller — one key-bounded aggregate); the fit itself
    * runs on |items| + |item-pairs| rows (models, brands, arena
    * entrants — planner-scale). Each round's score table is referenced
    * TWICE (both endpoints), so lineage is truncated EVERY round —
    * without that the plan doubles per round (2^K copies of the base).
    *
    * @param prefs one row per (winner, loser) observation group with a
    *              count column; duplicates combine. Self-matches drop.
    * @return (item, wins, matches, score_ppm) — higher = stronger. */
  /** @param smallItemSet when true, the (item, wins) and symmetric-match
    *        tables are COLLECTED and the MM rounds run driver-side in the
    *        identical integer arithmetic — bit-for-bit the same scores
    *        (spec-pinned), none of the per-round job barriers. This is
    *        the right mode when items are leaderboard-scale (models,
    *        brands, arena entrants — the common case); the distributed
    *        path remains for item universes that don't fit a driver
    *        (pageRank's smallVertexSet honesty about WHERE the data is:
    *        the corpus-scale pair COUNTING happened upstream either
    *        way). Guarded at 2M pair rows — past that, use the
    *        distributed rounds. */
  def bradleyTerry(
      prefs: DataFrame,
      winnerCol: String = "winner",
      loserCol: String = "loser",
      nCol: String = "n",
      iterations: Int = 5,
      smallItemSet: Boolean = false
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be positive, got $iterations")
    val p = prefs.select(col(winnerCol).cast("long").as("w"),
        col(loserCol).cast("long").as("l"), col(nCol).cast("long").as("n"))
      .filter(col("w") =!= col("l"))
      .groupBy("w", "l").agg(sum(col("n")).as("n"))
      .persist()
    if (smallItemSet) return bradleyTerryLocal(p, iterations)
    val wins = p.groupBy(col("w").as("item")).agg(sum(col("n")).as("wins"))
    val items = p.select(col("w").as("item"))
      .union(p.select(col("l"))).distinct()
    val m = p.select(col("w").as("i"), col("l").as("j"), col("n"))
      .unionAll(p.select(col("l").as("i"), col("w").as("j"), col("n")))
      .groupBy("i", "j").agg(sum(col("n")).as("n"))
      .persist()
    val matches = m.groupBy(col("i").as("item")).agg(sum(col("n")).as("matches"))
    val base = items.join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .persist()
    var s = base.select(col("item"), lit(1000000L).as("s"))
    for (_ <- 1 to iterations) {
      val den = m
        .join(s.select(col("item").as("i"), col("s").as("si")), "i")
        .join(s.select(col("item").as("j"), col("s").as("sj")), "j")
        .groupBy(col("i").as("item"))
        .agg(sum(expr("(n * 1000000000000) DIV (si + sj)")).as("den"))
      s = base.join(den, Seq("item"), "left")
        .select(col("item"),
          greatest(lit(1L), expr(
            "CASE WHEN den IS NULL OR den = 0 THEN CAST(1 AS BIGINT)" +
              " ELSE (wins * 1000000000000) DIV den END")).as("s"))
        .localCheckpoint(true)
    }
    // p/m/base stay persisted for the returned plan's matches/wins
    // branches — the pair-finders' session cache contract (header note):
    // callers running many fits should clearCache between corpora
    base.join(matches, Seq("item"), "left")
      .join(s, Seq("item"))
      .select(col("item"), col("wins"),
        coalesce(col("matches"), lit(0L)).as("matches"),
        col("s").as("score_ppm"))
  }

  /** Driver-side MM rounds over the collected pair table — the identical
    * integer recurrence (all operands non-negative, so Scala `/` equals
    * Spark `DIV` / DuckDB `//` truncation), hence bit-identical scores. */
  private def bradleyTerryLocal(p: DataFrame, iterations: Int): DataFrame = {
    val spark = p.sparkSession
    val rows = p.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    p.unpersist()
    require(rows.length <= 2000000,
      s"smallItemSet collected ${rows.length} pair rows (max 2e6) — " +
        "use the distributed rounds for this item universe")
    val wins = rows.groupBy(_._1).map { case (i, g) => i -> g.map(_._3).sum }
    val m = (rows.map { case (w, l, n) => ((w, l), n) } ++
      rows.map { case (w, l, n) => ((l, w), n) })
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val items = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    val matches = m.toSeq.groupBy(_._1._1)
      .map { case (i, g) => i -> g.map(_._2).sum }
    var s = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val den = m.toSeq.groupBy(_._1._1).map { case (i, g) =>
        i -> g.map { case ((_, j), n) => (n * 1000000000000L) / (s(i) + s(j)) }.sum
      }
      s = items.map { i =>
        val d = den.getOrElse(i, 0L)
        val w = wins.getOrElse(i, 0L)
        i -> math.max(1L, if (d == 0) 1L else (w * 1000000000000L) / d)
      }.toMap
    }
    import spark.implicits._
    items.map(i => (i, wins.getOrElse(i, 0L), matches.getOrElse(i, 0L), s(i)))
      .toSeq.toDF("item", "wins", "matches", "score_ppm")
  }
}
