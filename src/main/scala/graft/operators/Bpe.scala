package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-TRAINING step of an LLM data pipeline. Every other token
  * operator here consumes a tokenization (d17/pk01 budget by token count,
  * x14/x23 score token streams); this one produces the artifact those
  * counts come from: the ordered merge list a BPE tokenizer is.
  *
  * == Algorithm, re-expressed for Spark ==
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the corpus: count
  * each distinct word once (the only corpus-scale stage — one exploded
  * groupBy with map-side combine), then iterate on the |vocab|-row table.
  * Each round: (1) explode each word's current symbol sequence into
  * adjacent pairs weighted by word frequency, (2) pick the most frequent
  * pair (ties: count DESC, then (a, b) lexicographic — a total order, so
  * the learned vocabulary is engine/retry/partitioning-deterministic),
  * (3) re-segment every word by merging that pair greedily left-to-right.
  * The corpus is NEVER rescanned after round 0; per-round cost is
  * O(|vocab|·avg word length) — at 100 TB the vocab is a few million rows
  * and rounds are planner-cheap. (Production trainers running 50k merges
  * keep incremental pair-count deltas instead of recounting — same
  * semantics, an optimization this round-count doesn't need.)
  *
  * == The merge fold ==
  *
  * A segmentation is stored as symbols joined by U+001F (words containing
  * that control char are excluded — stated contract, vacuous on text).
  * Applying merge (a, b) is a LEFT FOLD over the symbol array: if the
  * accumulator ends with SEP+a and the next symbol equals b, append the
  * symbol WITHOUT a separator (the merged symbol IS the concatenation);
  * otherwise append with one. The suffix test is exact — symbols never
  * contain SEP, so `endsWith(SEP + a)` identifies "last symbol == a" and
  * nothing else — and the fold is greedy left-to-right ("aaa" under (a,a)
  * becomes [aa, a]), matching the reference BPE scan. Both engines run
  * the identical fold (Spark `aggregate` HOF inside whole-stage codegen;
  * DuckDB `list_reduce`), so segmentations replay bit-for-bit.
  *
  * No end-of-word marker is appended (merges act on word interiors only)
  * and pair counts weight by word frequency — both stated contracts the
  * oracle mirrors.
  */
object Bpe {

  /** U+001F unit separator — cannot appear in whitespace-split words of
    * normal text; words containing it are excluded by contract. */
  val Sep = "\u001F"

  /** One learned merge: round index, the pair, its weighted count. */
  final case class Merge(round: Int, a: String, b: String, pairCount: Long)

  /** The word-frequency table with initial character segmentation —
    * the ONE corpus-scale stage (exploded groupBy, map-side combined). */
  def initialVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(words(col(textCol))).as("w"))
      .filter(!col("w").contains(Sep))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      // split(w, "") = one element per character; canonical form has NO
      // leading separator
      .withColumn("seg", array_join(split(col("w"), ""), Sep))

  /** Learn up to `rounds` merges; returns the final segmented vocab and
    * the ordered merge list. Stops early if no adjacent pair remains
    * (every word fully merged to one symbol). */
  def learn(
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int = 4
  ): (DataFrame, Seq[Merge]) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var vocab = initialVocab(docs, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val syms = split(col("seg"), Sep)
      // adjacent pairs; single-symbol words contribute none. The explicit
      // size guard matters: Spark's sequence(1, 0) DESCENDS instead of
      // yielding empty (same trap as the simhash chunker).
      val pairs = vocab
        .filter(size(syms) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(syms) - 1),
          i => struct(element_at(syms, i).as("a"),
            element_at(syms, i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      // total order ⇒ deterministic winner; TakeOrderedAndProject(1), and
      // the collect is ONE row — planner-scale metadata, like g02's round
      // barrier or VectorIndex's codebooks
      val top = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, cnt)
        val folded = aggregate(syms, lit(""),
          (acc, s) => when(acc.endsWith(Sep + a) && s === b, concat(acc, s))
            .otherwise(concat(acc, lit(Sep), s)))
        // the fold emits a leading separator (first append) — strip it
        val next = vocab
          .withColumn("seg", substring(folded, 2, Int.MaxValue))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the parent cache
        vocab.unpersist()
        vocab = next
      }
      r += 1
    }
    (vocab, merges.result())
  }

  /** The learned merge table as a DataFrame (round, a, b, pair_count) —
    * the tokenizer artifact itself. */
  def learnMerges(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int = 4
  ): DataFrame = {
    val (vocab, merges) = learn(docs, textCol, rounds)
    vocab.unpersist()
    import spark.implicits._
    merges.toDF("round", "a", "b", "pair_count")
  }

  /** Per-document token counts under the learned segmentation — the
    * number every budget operator (d17, pk01, d40) consumes. Token
    * lengths come from the TRAINED VOCAB (each distinct word was already
    * segmented during learning), broadcast back onto the exploded corpus:
    * the corpus-side work is one scan + one map-side-combined doc agg; no
    * per-row re-folding. Words OOV to the vocab (a NEW corpus scored
    * against a stored tokenizer) fall back to character count — the
    * untrained-tokenizer upper bound, via a LEFT join so the fallback
    * never drops rows. Documents with no qualifying words yield no row
    * (ln01's contract). */
  def tokenCounts(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      rounds: Int = 4
  ): DataFrame = {
    val (vocab, _) = learn(docs, textCol, rounds)
    tokenCountsWithVocab(docs, vocab, idCol, textCol)
  }

  /** The scoring half of [[tokenCounts]] against an already-fitted vocab
    * (in-memory or [[storedVocab]]). */
  def tokenCountsWithVocab(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val tokLen = vocab.select(col("w"),
      size(split(col("seg"), Sep)).as("n_tok"))
    docs
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .filter(!col("w").contains(Sep))
      .join(broadcast(tokLen), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(coalesce(col("n_tok"), length(col("w")).cast("int")))
          .cast("long").as("n_tokens"))
  }

  /** Fit + persist the tokenizer artifact: `path/merges` (the ordered
    * merge list — what a BPE tokenizer IS) and `path/vocab` (the trained
    * word segmentations). Written once by the training job, read by every
    * later tokenization run — the e14/Lm stored-artifact class: at 100 TB
    * the trainer runs once over the corpus and ships a few-MB artifact;
    * no scoring job ever re-trains. */
  def fitAndStore(
      docs: DataFrame,
      path: String,
      textCol: String = "text",
      rounds: Int = 4
  ): Unit = {
    val (vocab, merges) = learn(docs, textCol, rounds)
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF("round", "a", "b", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    vocab.write.mode("overwrite").parquet(s"$path/vocab")
    vocab.unpersist()
  }

  def storedMerges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/merges")

  def storedVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/vocab")

  /** Tokenizer-drift monitor: per-group OOV share and token-rate delta of
    * a NEW batch scored against a STORED vocab — the "has the corpus
    * drifted past the tokenizer" gate that decides when a retrain is due
    * (pairs with x19's quantile drift and x26's categorical drift; this
    * one watches the tokenizer artifact itself). Per group:
    *
    *   - `oov_ppm` — share of words the trained vocab has never seen
    *     (millionths). OOV words are exactly where [[tokenCountsWithVocab]]
    *     falls back to char counts, i.e. where token budgets degrade to the
    *     untrained upper bound — the cost signal of a stale tokenizer.
    *   - `tok_rate_ppm` — tokens per IN-VOCAB word (millionths): even on
    *     known words, a drifted batch skews toward words the trainer saw
    *     rarely and segmented long.
    *   - `ref_rate_ppm` / `rate_delta_ppm` — the trainer's own
    *     frequency-weighted token rate (a pure function of the stored
    *     vocab, no training-corpus rescan) and the batch's deviation.
    *
    * All ratios are integer millionths (`div` on nonnegative longs =
    * DuckDB `//`), so the verdict hash-replays. Shape: one batch scan →
    * exploded words LEFT-joined against the broadcast vocab lengths →
    * map-side-combined group agg; the reference rate is a 1-row aggregate
    * of the KB-scale vocab cross-joined back. The batch never shuffles on
    * anything wider than `groupCol`. */
  def driftMonitor(
      batch: DataFrame,
      vocab: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"
  ): DataFrame = {
    val tokLen = vocab.select(col("w"),
      size(split(col("seg"), Sep)).cast("long").as("n_tok"))
    val ref = vocab
      .select(
        sum(col("freq") * size(split(col("seg"), Sep)).cast("long")).as("t"),
        sum(col("freq")).as("n"))
      .select(expr("(CAST(1000000 AS BIGINT) * t) div n").as("ref_rate_ppm"))
    batch
      .select(col(groupCol), explode(words(col(textCol))).as("w"))
      .filter(!col("w").contains(Sep))
      .join(broadcast(tokLen), Seq("w"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("n_tok").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("n_tok"), lit(0L))).as("n_tokens_iv"))
      .crossJoin(broadcast(ref))
      .select(col(groupCol), col("n_words"), col("n_oov"),
        expr("(CAST(1000000 AS BIGINT) * n_oov) div n_words").as("oov_ppm"),
        when(col("n_words") > col("n_oov"),
          expr("(CAST(1000000 AS BIGINT) * n_tokens_iv) div (n_words - n_oov)"))
          .as("tok_rate_ppm"),
        col("ref_rate_ppm"),
        (when(col("n_words") > col("n_oov"),
          expr("(CAST(1000000 AS BIGINT) * n_tokens_iv) div (n_words - n_oov)"))
          - col("ref_rate_ppm")).as("rate_delta_ppm"))
  }
}
