package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed keep/drop curation verdict (d38's semantics, factored out
  * so the SAME expression tree serves the batch query and the streaming
  * ingest gate): every quality signal — length, TTR-based quality,
  * duplicate-bigram repetition, stopword lang-ID vs the stored lang
  * column — evaluated in ONE scan-local pass, first failing rule wins as
  * the per-doc audit reason. All signals are the exact d03/d04/d05/d15
  * formulations, so the verdict is bit-replayable against the DuckDB
  * oracle.
  *
  * Zero shuffles, zero joins, zero state: the 100 TB shape is a pure map
  * over the corpus — which is also why [[graft.streaming.Streaming
  * .curationGateStream]] can apply this to an unbounded stream unchanged
  * (stateless narrow ops need no watermark and accrue nothing across
  * micro-batches).
  */
object Curation {

  /** @param carryCols input columns passed through UNTOUCHED to the
    *        output (appended after the verdict columns) — lets callers
    *        aggregate verdicts by source/date/shard without re-joining
    *        the corpus on doc_id (the [[datasheet]] one-pass contract). */
  def gate(
      docs: DataFrame,
      idCol: String = "doc_id",
      langCol: String = "lang",
      textCol: String = "text",
      carryCols: Seq[String] = Nil
  ): DataFrame = {
    val carry = carryCols.map(col)
    val gated = docs
      .select(col(idCol).as("doc_id") +: col(langCol).as("lang") +:
        words(col(textCol)).as("ws") +: carry: _*)
      .select(col("doc_id") +: col("lang") +: col("ws") +:
        size(col("ws")).as("n_words") +:
        size(array_distinct(col("ws"))).as("n_distinct") +:
        shingles(col("ws"), 2).as("bg") +:
        stopwordHits(col("ws"), EnStop).as("en") +:
        stopwordHits(col("ws"), EsStop).as("es") +:
        stopwordHits(col("ws"), DeStop).as("de") +: carry: _*)
      .select(Seq(col("doc_id"), col("lang"), col("n_words"),
        ((col("n_distinct").cast("double") / nullif(col("n_words"), lit(0))
          * lit(0.5)) +
          (least(col("n_words").cast("double") / lit(20.0), lit(1.0))
            * lit(0.5))).as("quality"),
        (lit(1.0) - size(array_distinct(col("bg"))).cast("double")
          / nullif(size(col("bg")), lit(0))).as("dup_bigram_ratio"),
        when(col("en") >= col("es") && col("en") >= col("de"), "en")
          .when(col("es") >= col("de"), "es").otherwise("de")
          .as("detected_lang")) ++ carry: _*)
    val reason = when(col("quality") < 0.62, "low_quality")
      .when(col("n_words") < 15, "too_short")
      .when(col("dup_bigram_ratio") > 0.12, "repetitive")
      .when(col("detected_lang") =!= col("lang"), "lang_mismatch")
      .otherwise("ok")
    gated.select(col("doc_id") +: col("n_words") +: col("quality") +:
      col("dup_bigram_ratio") +: col("detected_lang") +:
      reason.as("reason") +: (reason === "ok").as("keep") +: carry: _*)
  }

  /** Per-source DATASET CARD (Gebru et al. 2021's datasheet, the
    * machine-computable slice): one row per source — document and token
    * volume, language spread, exact-duplicate rows (n − distinct
    * fingerprints, the d01 measure), gate-kept share — the at-a-glance
    * audit a corpus release ships with, and the admission evidence a
    * training run records for provenance.
    *
    * One pass + one groupBy, NO join: the [[gate]] verdict is computed
    * scan-locally with `source`, the token count, and the md5 fingerprint
    * carried through the same projection (`carryCols`), so the whole card
    * costs a single corpus scan and one source-key-bounded exchange (the
    * fingerprint distinct rides the same aggregate as x18's exact mode —
    * the oracle-payload price, affordable because the card IS the
    * deliverable). Shares in integer millionths, floor division. */
  def datasheet(
      docs: DataFrame,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      langCol: String = "lang",
      textCol: String = "text"
  ): DataFrame = {
    val g = gate(
      docs.withColumn("__graft_tok", tokenCount(col(textCol)).cast("long"))
        .withColumn("__graft_fp", md5(col(textCol)))
        .withColumn("__graft_lang", col(langCol)),
      idCol, langCol, textCol,
      carryCols = Seq(sourceCol, "__graft_tok", "__graft_fp", "__graft_lang"))
    g.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__graft_tok")).as("n_tokens"),
        countDistinct(col("__graft_lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("__graft_fp")))
          .as("n_exact_dup_rows"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Agreement.floorDiv(col("n_tokens"), col("n_docs")).as("mean_tokens"),
        col("n_langs"), col("n_exact_dup_rows"), col("n_kept"),
        Agreement.floorDiv(lit(1000000L) * col("n_kept"), col("n_docs"))
          .as("kept_millionths"))
  }

  /** Deterministic NEGATIVE-PAIR sampling for contrastive training: each
    * document draws `negsPerDoc` pseudo-random partners from the corpus
    * as a pure function of its own id — identical pairs on any engine,
    * any partitioning, any retry (the same portable-PolyHash determinism
    * contract as d16's sampler and d41's split).
    *
    * The naive formulations both die at scale: uniform-random partner
    * choice needs a global row-number (one all-data sort) or a
    * rand()-keyed join (non-replayable), and "pair with anything" is a
    * cross join. Instead the corpus is carved into `buckets` hash cells
    * and each cell elects one REPRESENTATIVE (min id — a map-side-
    * combined aggregate of bucket→id, `buckets` rows total). A document's
    * t-th negative is the representative of cell PolyHash(id,t) mod
    * buckets: drawing is a scan-local expression plus one equi-join
    * against the broadcast representative table. Self-pairs (a document
    * drawing its own cell while being its representative) are dropped,
    * so a document can emit fewer than `negsPerDoc` pairs; duplicate
    * draws (two t landing in one cell) collapse — both edge rules are
    * part of the replayable contract. Bias note: only representatives
    * ever serve as negatives — fine for the hard-negative-mining warm
    * start it feeds; pass a per-epoch `salt` to rotate BOTH the cell
    * assignment and the draws (different epochs see different
    * representatives and different pairings, each epoch still fully
    * deterministic on its own).
    *
    * 100 TB shape: one aggregate (buckets rows) + one broadcast join —
    * the corpus is scanned twice, shuffled never. */
  def negativePairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      negsPerDoc: Int = 3,
      buckets: Int = 64,
      salt: String = ""
  ): DataFrame = {
    require(negsPerDoc >= 1 && buckets >= 2,
      s"need negsPerDoc >= 1 (got $negsPerDoc) and buckets >= 2 (got $buckets)")
    val ids = docs.select(col(idCol).cast("string").as("doc_id"))
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      graft.expressions.PolyHash(concat(lit(s"negbkt$salt|"), c)) % buckets
    val reps = ids.groupBy(bucketOf(col("doc_id")).as("bucket"))
      .agg(min(col("doc_id")).as("neg_id"))
    val draws = ids.select(col("doc_id"),
        explode(array((1 to negsPerDoc).map(t =>
          (graft.expressions.PolyHash(
            concat(lit(s"negdraw$salt$t|"), col("doc_id"))) % buckets)
            .as(s"t$t")): _*)).as("bucket"))
      .distinct() // duplicate draws collapse (replayable rule)
    draws.join(broadcast(reps), "bucket")
      .filter(col("neg_id") =!= col("doc_id")) // no self-pairs
      .select(col("doc_id"), col("neg_id"))
  }

  /** Deterministic global training order — the "shuffle the corpus before
    * training" step every LLM run performs, as a REPLAYABLE artifact: each
    * document gets a pseudorandom sort key (PolyHash of a salted id — no
    * rand(), so retries, engines, and re-runs agree bit-for-bit), the key
    * space is RANGE-divided into `nShards` contiguous slices, and each
    * document's position within its shard is its rank by (key, id). The
    * global stream order is exactly (shard, pos) — a trainer reads shard
    * files in shard order and gets the full permutation; epoch rotation is
    * the `salt` (each epoch a fresh, equally deterministic permutation).
    *
    * Why range-sharding on the hash (not `hash % nShards`): modulo
    * interleaves the global order across shards, so reproducing the
    * stream would need a global merge; contiguous key ranges make
    * shard-major concatenation ≡ global key order, which is what lets
    * 1000 trainer workers each read one shard sequentially.
    *
    * 100 TB shape: ONE exchange (hash-range repartition to shards) + an
    * in-partition sort and rank — the same cost as writing the shuffled
    * copy at all. No global row_number (a single-partition window is the
    * classic driver-choke); ranks are per-shard, where the window
    * partitioning IS the data partitioning. Shard skew is hash-uniform
    * (keys are PolyHash outputs, so shard fill is binomial — ±√n around
    * n/nShards). */
  def trainingOrder(
      docs: DataFrame,
      idCol: String = "doc_id",
      nShards: Int = 8,
      salt: String = ""
  ): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val space = 1000000007L // PolyHash modulus = key-space size
    val width = (space + nShards - 1) / nShards
    // The id goes FIRST in the hashed string: a polynomial hash places the
    // variation of its final characters in the low-order coefficients, so
    // sequential ids under a salt-PREFIX form one contiguous key band and
    // range-sharding piles them into a single shard (measured: 900/1000
    // docs in one of 8 shards). Leading variation is multiplied by
    // 257^|suffix| mod p — pseudorandom stride, uniform shard fill.
    //
    // The salt does NOT go into the string at all: PolyHash is affine in
    // every character, so a salt that differs only in its own characters
    // shifts every key by the SAME constant mod p — a constant shift
    // preserves sort order except at the single wraparound point, i.e.
    // "epoch rotation" would re-emit the identical permutation (measured:
    // salt e1 vs e2, 1000/1000 docs in the same order). Instead the salt
    // becomes an affine map of the key space onto itself:
    //   key' = (key·mult + add) mod p,  mult ∈ [1, p−1]
    // p prime ⇒ the map is a bijection (no collisions introduced), and a
    // multiplier ≠ 1 scrambles relative order the way an LCG does. mult
    // and add derive from the salt via the same PolyHash, computed once
    // on the driver — pure function of the salt, so every engine and
    // retry agrees.
    def ph(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 257L + (b & 0xff)) % space)
      h
    }
    val mult = ph(s"mult|$salt") % (space - 1) + 1 // never 0 ⇒ bijective
    val addc = ph(s"add|$salt")
    // key < p and mult < p ⇒ product < ~1.0e18, inside Long range
    val base = graft.expressions.PolyHash(
      concat(col(idCol).cast("string"), lit("|shuffle")))
    val key = (base * mult + addc) % space
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("sort_key"), col(idCol))
    docs.select(col(idCol), key.as("sort_key"))
      .withColumn("shard", floor(col("sort_key") / width).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Temperature-flattened source mixing at α = 1/2 — the multilingual
    * sampling recipe (p_i ∝ q_i^α, per mT5 / XLM-R / CC-mix practice)
    * between [[graft.queries.TextQueries]] d27's uniform balance (α = 0)
    * and no rebalancing (α = 1): each source keeps ~sqrt(min_cnt ·
    * cnt_i) documents — the GEOMETRIC MEAN of the two endpoints — so
    * dominant sources are damped without flattening real signal away.
    *
    * α = 1/2 is the integer-exact temperature: the per-mille keep
    * threshold is floor(sqrt((10^6 · min_cnt) DIV cnt_i)), one integer
    * division then one IEEE-754 sqrt — correctly rounded by spec in both
    * the JVM and DuckDB, so the threshold (and thus every keep decision)
    * replays bit-for-bit. Other temperatures need a rational-exponent
    * ladder (repeated isqrt for α = k/2^m) — out of scope, stated.
    * Membership is the portable PolyHash bucket (d16/d27's replay
    * contract): deterministic across engines, retries, partitionings.
    *
    * 100 TB shape: d27's exactly — one tiny per-source aggregate
    * broadcast back onto a scan-local filter; the corpus itself never
    * shuffles. */
  def temperatureSample(
      docs: DataFrame,
      keyCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    val stats = docs.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val th = stats
      .withColumn("min_cnt", min(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(keyCol),
        floor(sqrt(expr("(min_cnt * 1000000) DIV cnt")))
          .cast("long").as("th"))
    val bucket = graft.expressions.PolyHash(
      concat(lit("temp|"), col(idCol).cast("string"))) % 1000
    docs.select(col(idCol), col(keyCol), bucket.as("bucket"))
      .join(broadcast(th), Seq(keyCol))
      .filter(col("bucket") < col("th"))
      .select(col(idCol), col(keyCol), col("bucket"), col("th"))
  }

  /** SIZE-BIASED sampling — exactly `k` documents with inclusion
    * probability ∝ token count, by SEQUENTIAL POISSON / order sampling
    * (Ohlsson 1998, the Swedish-CPI πps estimator; Rosén 1997): draw a
    * uniform u_i per doc, take the k smallest priorities u_i / w_i. A
    * token BUDGET is a size-weighted object — uniform doc sampling
    * underweights exactly the long documents that dominate it; πps is
    * the sampler whose Horvitz–Thompson estimates of token-weighted
    * corpus statistics come out right. Complements the sampling family:
    * d16 stratifies, d35 takes per-stratum constants, d46/d48 mix
    * sources — this one biases by SIZE.
    *
    * Integer-exact throughout: u_i = PolyHash(salt|id) % 1e9 + 1 (a
    * per-mille-fine uniform, never 0), priority = (u_i·1e6) DIV w_i —
    * longs bounded by ~1e15 — ties (priority, id); the draw replays on
    * any engine/retry/partitioning. The Horvitz–Thompson weight ships
    * with each row as ht_weight_ppm = (W·1e6) DIV (k·w_i) (the
    * first-order πps inclusion approximation π_i ≈ k·w_i/W; docs so
    * large that k·w_i > W are certainty-class units whose weight caps
    * below 1e6, stated — promote them out of the draw when exactness
    * there matters). W·1e6 stays in a long while the corpus holds under
    * ~9.2e12 tokens; past that, DECIMAL(38,0) is the documented escape
    * (x21's contract). Docs with zero qualifying words carry no size and
    * are excluded, stated.
    *
    * 100 TB shape: one scan computing (w, u, priority) scan-locally, a
    * 1-row token-total aggregate broadcast back, and the global bottom-k
    * via orderBy(...).limit(k) — TakeOrderedAndProject's per-partition
    * heaps, never a global sort. */
  /** The scan-local half of [[ppsSample]]: (doc_id, n_words, priority)
    * per sized doc. Priorities are pure functions of (salt, id, size), so
    * any two computations — batch vs batch, batch vs stream — agree
    * row-for-row; this is what makes the streaming sample artifact
    * ([[graft.streaming.Streaming.ppsSampleSink]]) converge to the batch
    * draw regardless of arrival order or batch boundaries. */
  private[graft] def ppsPriorities(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      salt: String
  ): DataFrame = {
    val sized = docs.select(col(idCol).as("doc_id"),
        size(graft.functions.TextFunctions.words(col(textCol)))
          .cast("long").as("n_words"))
      .filter(col("n_words") > 0)
    val u = (graft.expressions.PolyHash(concat(
      lit(s"pps$salt|"), col("doc_id").cast("string"))) % 1000000000L) + 1L
    sized
      .select(col("doc_id"), col("n_words"), u.as("u"))
      .select(col("doc_id"), col("n_words"),
        expr("(u * 1000000) DIV n_words").as("priority"))
  }

  /** The Horvitz–Thompson weighting half of [[ppsSample]], reusable by
    * the stored-artifact read path: weights a bottom-k priority table
    * given the corpus token total it was drawn from. */
  private[graft] def ppsWeighted(sample: DataFrame, k: Int, tot: DataFrame): DataFrame =
    sample.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_words"), col("priority"),
        expr(s"(w_total * 1000000) DIV (CAST($k AS BIGINT) * n_words)")
          .as("ht_weight_ppm"))

  def ppsSample(
      docs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = ""
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = ppsPriorities(docs, idCol, textCol, salt)
    val tot = keyed.agg(sum(col("n_words")).as("w_total"))
    ppsWeighted(
      keyed.orderBy(col("priority"), col("doc_id")).limit(k), k, tot)
  }

  /** EXACT budget allocation across sources — "take exactly `budget`
    * documents, apportioned ∝ sqrt(source size)" — the mix-PLANNING step
    * between [[temperatureSample]] (per-source RATES, keeps ~rate·n with
    * binomial noise) and d35's fixed per-stratum quotas (a constant k,
    * no budget notion). A training-data order is usually stated as a
    * budget ("10M documents for the ablation"), and rates can't hit a
    * budget exactly; this does, deterministically.
    *
    * Apportionment is Hamilton's method (largest remainder — the seat-
    * allocation classic): seats_i = floor(budget·w_i / W), then the
    * leftover budget − Σ seats goes to the largest remainders
    * budget·w_i mod W, ties to the lexicographically smaller source.
    * Weights are w_i = floor(sqrt(10^6 · cnt_i)) — the α=1/2 temperature
    * in [[temperatureSample]]'s integer-exact form. Every step is
    * integer arithmetic on the |sources|-row stats table (windows over
    * planner-scale data), so the allocation replays bit-for-bit;
    * `budget·w_i` stays in a long while budget ≤ 1e9 (require'd;
    * DECIMAL(38,0) is the documented escape past that).
    *
    * A source smaller than its seats is CAPPED at its size (take_n =
    * min(seats, cnt)) and the budget under-fills, stated — re-run with
    * exhausted sources excluded when exact fill matters (the iterative
    * water-fill a real allocator runs; one pass per exhausted tier).
    *
    * Selection inside a source is the portable-hash rank (d35's replay
    * contract): the take_n smallest PolyHash("alloc|" + id) win, ties
    * impossible (hash of distinct ids may collide — (hash, id) breaks
    * it). One corpus shuffle (the per-source rank window; hot sources
    * pay their size — d35's bucketed-rank hatch applies unchanged). */
  def budgetAllocate(
      docs: DataFrame,
      budget: Long,
      keyCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0 && budget <= 1000000000L,
      s"budget must be in (0, 1e9], got $budget (DECIMAL escape documented)")
    val w = org.apache.spark.sql.expressions.Window
    val stats = docs.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("wt", floor(sqrt(col("cnt") * lit(1000000L))).cast("long"))
    val seats = stats
      .withColumn("tw", sum(col("wt")).over(w.partitionBy()))
      .withColumn("s", expr(s"($budget * wt) DIV tw"))
      .withColumn("rem", expr(s"($budget * wt) % tw"))
      .withColumn("extra",
        (lit(budget) - sum(col("s")).over(w.partitionBy())).cast("long"))
      .withColumn("rrank", row_number().over(
        w.partitionBy().orderBy(col("rem").desc, col(keyCol))).cast("long"))
      .withColumn("seats",
        col("s") + when(col("rrank") <= col("extra"), 1L).otherwise(0L))
      .select(col(keyCol), least(col("seats"), col("cnt")).as("take_n"))
    val rank = row_number().over(
      w.partitionBy(col(keyCol)).orderBy(
        graft.expressions.PolyHash(
          concat(lit("alloc|"), col(idCol).cast("string"))), col(idCol)))
    docs.select(col(idCol), col(keyCol))
      .withColumn("pos", rank.cast("long"))
      .join(broadcast(seats), Seq(keyCol))
      .filter(col("pos") <= col("take_n"))
      .select(col(idCol), col(keyCol), col("pos"), col("take_n"))
  }

  /** [[budgetAllocate]] with the under-fill closed: when a source caps at
    * its size, the shortfall is RE-APPORTIONED over the un-exhausted
    * sources until the budget fills exactly (or the corpus runs out) —
    * the iterative water-fill a real allocator runs. The fixpoint loop
    * runs DRIVER-SIDE on the collected |sources|-row stats (planner-scale
    * metadata, the Merge-partition-list / BPE-merge class; ≤ |sources|
    * passes since each pass exhausts at least one source), then ships the
    * final per-source quota back as one broadcast join — the corpus-side
    * plan is identical to [[budgetAllocate]]'s single rank-filter pass.
    * Same integer arithmetic per pass, so the allocation replays
    * bit-for-bit. Equals [[budgetAllocate]] whenever no source caps. */
  def budgetAllocateExact(
      docs: DataFrame,
      budget: Long,
      keyCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0 && budget <= 1000000000L,
      s"budget must be in (0, 1e9], got $budget (DECIMAL escape documented)")
    val statsRows = docs.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    def hamilton(b: Long, ws: Seq[(String, Long)]): Map[String, Long] = {
      val tw = ws.map(_._2).sum
      val base = ws.map { case (k, wt) => (k, b * wt / tw, b * wt % tw) }
      val extra = b - base.map(_._2).sum
      val bump = base.sortBy { case (k, _, rem) => (-rem, k) }
        .take(extra.toInt).map(_._1).toSet
      base.map { case (k, s, _) => k -> (s + (if (bump(k)) 1L else 0L)) }.toMap
    }
    // Per pass: apportion the remaining budget over the still-open
    // sources; any source whose seats reach its size is frozen at that
    // size and leaves the pool; open sources receive nothing until the
    // final pass (the one with no new caps), where their seats land.
    // Each non-final pass freezes ≥ 1 source, so ≤ |sources| passes.
    val take = scala.collection.mutable.Map[String, Long]()
    var active = statsRows.toSeq
    var remaining = budget
    while (remaining > 0 && active.nonEmpty) {
      val ws = active.map { case (k, cnt) =>
        (k, math.floor(math.sqrt(cnt.toDouble * 1000000.0)).toLong)
      }
      val seats = hamilton(remaining, ws)
      val (capped, open) = active.partition { case (k, cnt) => seats(k) >= cnt }
      if (capped.isEmpty) {
        open.foreach { case (k, _) => take(k) = seats(k) }
        remaining = 0
      } else {
        capped.foreach { case (k, cnt) => take(k) = cnt }
        active = open
        remaining = budget - take.values.sum
      }
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val quota = take.toSeq.toDF(keyCol, "take_n")
    val w = org.apache.spark.sql.expressions.Window
    val rank = row_number().over(
      w.partitionBy(col(keyCol)).orderBy(
        graft.expressions.PolyHash(
          concat(lit("alloc|"), col(idCol).cast("string"))), col(idCol)))
    docs.select(col(idCol), col(keyCol))
      .withColumn("pos", rank.cast("long"))
      .join(broadcast(quota), Seq(keyCol))
      .filter(col("pos") <= col("take_n"))
      .select(col(idCol), col(keyCol), col("pos"), col("take_n"))
  }

  /** Per-group QUANTILE NORMALIZATION — cross-source score harmonization
    * (Bolstad et al. 2003's quantile normalization, the FineWeb-style
    * "threshold per-domain by percentile" made into a reusable mapping):
    * a quality/length score is not comparable across sources when each
    * source has its own distribution, so a single global cutoff
    * systematically over-prunes some domains. This maps every (group,
    * score) to the GLOBAL score at the same within-group rank — after
    * normalization one global threshold means the same percentile
    * everywhere.
    *
    * Integer-exact end to end (so the mapping replays): within-group
    * discrete CDF p_ppm = cum(score)·1e6 DIV n_group, global mapping
    * q(p) = min{ s : cum_global(s)·1e6 ≥ p·n_global } — the same
    * discrete-quantile definition as Lm.fitThresholds, composed. When a
    * group IS the whole corpus the mapping is the identity (exactly,
    * while the corpus holds under 1e6 rows per distinct-score step —
    * the floor argument in the spec; past that the mapping can snap to
    * the previous distinct score, still rank-faithful).
    *
    * Shape: the corpus reduces map-side to per-group and global score
    * HISTOGRAMS; the cum-sum windows and the non-equi rank join run on
    * histogram-scale tables (|groups|·|distinct scores| ×
    * |distinct scores| worst case — planner-scale for any quantized
    * score), and the result is a KB mapping table to broadcast-join
    * against the corpus (or persist as a stored artifact, the x17
    * class). Returns one row per (group, score): (groupCol, score,
    * n_docs, p_ppm, norm_score). */
  def quantileNormalize(
      scores: DataFrame,
      groupCol: String,
      scoreCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = scores.select(col(groupCol).as("g"),
      col(scoreCol).cast("long").as("s"))
    val h = sc.groupBy("g", "s").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = h.withColumn("cum", sum(col("c")).over(cumW))
      .join(h.groupBy("g").agg(sum(col("c")).as("n")), "g")
      .withColumn("p_ppm", expr("(cum * 1000000) DIV n"))
    val gh = sc.groupBy("s").agg(count(lit(1)).as("c"))
    val gCumW = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single-partition window over the GLOBAL histogram — distinct-score
    // scale by construction, the same planner-scale contract as
    // Lm.fitThresholds' cum table
    val gc = gh.select(col("s").as("gs"),
        sum(col("c")).over(gCumW).as("cumg"))
      .crossJoin(broadcast(gh.agg(sum(col("c")).as("ng"))))
    p.join(broadcast(gc), expr("cumg * 1000000 >= p_ppm * ng"))
      .groupBy(col("g"), col("s"), col("c"), col("p_ppm"))
      .agg(min(col("gs")).as("norm_score"))
      .select(col("g").as(groupCol), col("s").as("score"),
        col("c").as("n_docs"), col("p_ppm"), col("norm_score"))
  }
}
