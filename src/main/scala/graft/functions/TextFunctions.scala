package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID heuristics, quality scoring,
  * fingerprinting. All pure Column expressions (whole-stage codegen'd; no
  * UDFs) so they compose with pushdown/pruning and scale linearly — the
  * design constraint is 100 TB of documents, where any per-row JVM lambda
  * would dominate the profile.
  */
object TextFunctions {

  /** Whitespace word split with empties dropped (so trailing separators
    * don't manufacture tokens). */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks — the standard pre-tokenizer shape, ASCII-scoped so the regex
    * behaves identically across engines. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word k-shingles as space-joined strings; empty when the document has
    * fewer than k words. */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*)))

  /** Normalized text for near-exact dedup: lowercase, trimmed, whitespace
    * collapsed. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content fingerprint = md5 of the normalized text (engine-portable,
    * byte-stable). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  // Small built-in stopword tables for the language-ID heuristic.
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "los", "que", "y", "en")
  val DeStop: Seq[String] = Seq("der", "die", "und", "das", "ein", "zu", "ist")

  def stopwordHits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stop)))

  /** Marker-stopword language-ID: argmax of per-language stopword hits,
    * ties broken en > es > de. A real system swaps in character-n-gram
    * profiles; the *shape* (pure per-row expression, no shuffle) is what
    * matters at scale. */
  def langGuess(ws: Column): Column = {
    val en = stopwordHits(ws, EnStop)
    val es = stopwordHits(ws, EsStop)
    val de = stopwordHits(ws, DeStop)
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }

  /** Type-token ratio: distinct words / words. */
  def typeTokenRatio(ws: Column): Column =
    size(array_distinct(ws)).cast("double") / nullif(size(ws), lit(0))

  /** Composite quality score in [0,1]: lexical diversity + length prior.
    * Deterministic double arithmetic (same operation order as the SQL
    * oracle). */
  def qualityScore(ws: Column): Column =
    (typeTokenRatio(ws) * lit(0.5)) +
      (least(size(ws).cast("double") / lit(20.0), lit(1.0)) * lit(0.5))

  /** 64-dim SimHash over word hashes (first 15 md5 hex chars → 60-bit
    * signature). Pure expression: per word, ±1 votes per bit; sign of the
    * per-bit sum becomes the signature bit. */
  def simhash(ws: Column, bits: Int = 60): Column = {
    val hashes = transform(ws, w =>
      conv(substring(md5(w), 1, 15), 16, 10).cast("long"))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, j) => {
        val vote = aggregate(hashes, lit(0),
          (a, h) => a + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
        acc + when(vote > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
      })
  }

  /** Hamming distance between two SimHash signatures. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
