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
    * fewer than k words.
    *
    * Implemented as a sliding zip (`zip_with` of the array against its own
    * shifted slices) rather than `element_at(ws, i)` indexing inside a
    * lambda: lambda-positioned references re-evaluate their operand once per
    * ELEMENT when Catalyst collapses projections (turning an O(n) shingle
    * pass into O(n²) re-tokenization). Here every `ws` reference sits at row
    * level, so the producer is evaluated at most k+1 times per row no matter
    * how the optimizer inlines it. */
  def shingles(ws: Column, k: Int): Column =
    graft.expressions.WordShingles(ws, k)

  /** Sliding-zip HOF formulation of [[shingles]] — reference shape, kept for
    * parity tests against the native expression. */
  def shinglesHof(ws: Column, k: Int): Column = {
    val n = size(ws)
    // joined[i] = ws[i] ⧺ ws[i+1] ⧺ … ⧺ ws[i+k-1]; zip_with pads with null
    // and concat null-propagates, so the k-1 tail entries become null.
    val joined = (2 to k).foldLeft(ws) { (acc, j) =>
      zip_with(acc, slice(ws, lit(j), greatest(n - (j - 1), lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(n < k, array().cast("array<string>"))
      .otherwise(slice(joined, lit(1), n - (k - 1)))
  }

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

  /** SimHash over word xxhash64s → `bits`-bit signature. Single pass over
    * the word hashes: per word, ±1 votes on each bit position (zip_with over
    * a per-doc vote vector); sign of the per-bit sum becomes the signature
    * bit. Each input sub-expression is referenced exactly once, so the plan
    * never duplicates the (relatively expensive) tokenize/hash work. */
  def simhash(ws: Column, bits: Int = 60): Column = {
    val hashes = transform(ws, w => xxhash64(w))
    val positions = sequence(lit(0), lit(bits - 1)) // foldable constant
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, positions, (a, j) =>
        a + when(call_function("shiftrightunsigned", h, j).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    aggregate(
      zip_with(votes, positions, (v, j) =>
        when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two SimHash signatures. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Portable SimHash: identical algorithm to [[simhash]] but with word
    * hashes drawn from md5 hex (first 15 chars = 60 bits, 4 bits per hex
    * nibble) so engines without xxhash64 — e.g. the DuckDB oracle — can
    * replay the signature bit-for-bit. xxhash64 stays the scale default.
    * Delegates to the native expression; [[simhashPortableHof]] keeps the
    * pure-Column formulation for cross-checking. */
  def simhashPortable(ws: Column, bits: Int = 60): Column =
    graft.expressions.PortableSimHash(ws, bits)

  /** Pure higher-order-function formulation of [[simhashPortable]] (same
    * values; interpreted — used by tests to cross-check the native
    * expression). */
  def simhashPortableHof(ws: Column, bits: Int = 60): Column = {
    val positions = sequence(lit(0), lit(bits - 1))
    // Per word: md5 once, then the 15 hex-nibble values once (4 bits each).
    // The bit loop below indexes these materialized arrays through lambda
    // variables only — nothing is re-evaluated per bit position.
    val nibbles = transform(transform(ws, w => md5(w)), h =>
      transform(sequence(lit(1), lit((bits + 3) / 4)), c => {
        val ch = call_function("substr", h, c, lit(1))
        when(ch.between("0", "9"), call_function("ascii", ch) - 48)
          .otherwise(call_function("ascii", ch) - 87)
      }))
    val votes = aggregate(
      nibbles,
      array_repeat(lit(0), bits),
      (acc, nv) => zip_with(acc, positions, (a, j) =>
        a + when(call_function("shiftright", element_at(nv, (j / 4).cast("int") + 1),
          pmod(j, lit(4))).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, positions, (v, j) =>
        when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }
}
