package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** KMV (bottom-k / min-wise) DATASET-similarity sketches: one KB-scale
  * synopsis per corpus slice (source, crawl, snapshot …), pairwise
  * Jaccard between slices estimated from the synopses alone — the
  * dataset-level audit question ("is this new crawl mostly a copy of an
  * old one?", "which licensed sources overlap?") answered without ever
  * joining the corpora. Published basis: Broder 1997 min-wise
  * independent permutations; Beyer, Haas, Reinwald, Sismanis, Gemulla
  * 2007 ("On synopses for distinct value estimation under multiset
  * operations") — the KMV synopsis; Cohen & Kaplan 2007 bottom-k
  * sketches. Reference tie-in: the reference's per-item fingerprint
  * stage idiom (FIXTURES.md §1.4) lifted from documents to whole
  * sources.
  *
  * Estimator: for sets A, B with bottom-k sketches K(A), K(B), the k
  * smallest hashes of A∪B are a subset of K(A) ∪ K(B); Jaccard is
  * estimated as |bottomk(A∪B) ∩ A ∩ B| / |bottomk(A∪B)| (membership
  * tested against the sketches — sound because any union-bottom-k
  * element of A is necessarily in K(A)). Error ~ 1/√k.
  *
  * Why KMV here instead of HLL/GK (x10/x17/x22): a set's k smallest
  * hashes are UNIQUE — independent of partitioning, merge order, and
  * executor count — so unlike HLL register estimates the KMV estimate
  * itself is deterministic and can be hash-compared against an oracle
  * bit-for-bit. No property-flag indirection needed.
  *
  * 100 TB shape: the sketch build is one distinct on (group, hash)
  * plus one map-side-combined bounded-heap aggregate (`topk_by` caps
  * partial state at k rows per group per map partition); the sketch
  * table is |groups| rows × ~k·32 bytes — a stored artifact in x17's
  * storage class. Pairwise comparison is |groups|² work on that
  * KB-scale table (broadcast nested-loop by design, like x22's
  * overlap matrix) and never rescans the corpus.
  */
object DatasetSketch {

  /** Hex-digit complement: an order-REVERSING bijection on md5 hex
    * strings, so `topk_by` (which keeps the k LARGEST by ord) keeps the
    * k SMALLEST hashes when ordered by the complement. Exact reversal —
    * no numeric truncation, no tie classes beyond hash equality. */
  private def revHex(c: org.apache.spark.sql.Column) =
    translate(c, "0123456789abcdef", "fedcba9876543210")

  /** Per-group KMV sketch over the md5 hashes of word `shingleK`-grams:
    * (g, kmv ARRAY<STRING> ascending, n_distinct exact). Groups whose
    * docs yield no shingle (all < shingleK words) are absent. */
  def kmvSketches(
      docs: DataFrame,
      k: Int = 128,
      shingleK: Int = 3,
      groupCol: String = "source",
      textCol: String = "text"
  ): DataFrame = {
    require(k >= 1, s"kmvSketches: k must be >= 1, got $k")
    val e = docs
      .select(col(groupCol).as("g"),
        TextFunctions.words(col(textCol)).as("ws"))
      .select(col("g"),
        explode(TextFunctions.shingles(col("ws"), shingleK)).as("sh"))
      .select(col("g"), md5(col("sh")).as("h"))
      .distinct()
    e.groupBy(col("g"))
      .agg(
        graft.expressions.TopKBy.topkBy(revHex(col("h")), col("h"), k)
          .as("top"),
        count(lit(1)).as("n_distinct"))
      .select(col("g"),
        expr("transform(top, s -> s.payload)").as("kmv"),
        col("n_distinct"))
  }

  /** Pairwise Jaccard estimates from the sketch table alone (g < g
    * ordering, all pairs): (src_a, src_b, n_a, n_b, j_est_millionths).
    * Integer millionths via floor division — engine-exact. The non-equi
    * self-join is a broadcast nested loop over the |groups|-row sketch
    * table: |groups|² pairs IS the product, never corpus-sized. */
  /** Asymmetric CONTAINMENT estimates from the SAME stored sketches —
    * d34's question ("is B essentially a subset of A?") lifted one level,
    * from documents to whole datasets. For M = bottomk(A∪B) (computed
    * from the two sketches, see [[pairEstimates]]), M is a uniform sample
    * of A∪B, so |A∩B| / |A| — the fraction of A also in B — is estimated
    * by |M∩A∩B| / |M∩A| (membership against the sketches is sound: a
    * union-bottom-k element of A is necessarily in K(A)). Deterministic
    * like the Jaccard estimate (bottom-k is unique), so the estimates
    * hash-compare against the oracle bit-for-bit. A side with no sampled
    * element (|M∩A| = 0 — possible when A's smallest hashes all sort
    * after B's k-th) carries no evidence and yields NULL, never a fake 0.
    * Output: (src_a, src_b, n_a, n_b, c_a_in_b_millionths = est
    * |A∩B|/|A|, c_b_in_a_millionths = est |A∩B|/|B|), integer millionths
    * via floor division. Same |groups|²-on-KB-sketches economics as
    * [[pairEstimates]] — the corpora are never rescanned. */
  def containmentEstimates(sketches: DataFrame, k: Int = 128): DataFrame = {
    val a = sketches.select(col("g").as("src_a"), col("kmv").as("ka"),
      col("n_distinct").as("n_a"))
    val b = sketches.select(col("g").as("src_b"), col("kmv").as("kb"),
      col("n_distinct").as("n_b"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("merged",
        expr(s"slice(array_sort(array_union(ka, kb)), 1, $k)"))
      .withColumn("m_ab",
        expr("""CAST(size(filter(merged,
          x -> array_contains(ka, x) AND array_contains(kb, x))) AS BIGINT)"""))
      .withColumn("m_a",
        expr("CAST(size(filter(merged, x -> array_contains(ka, x))) AS BIGINT)"))
      .withColumn("m_b",
        expr("CAST(size(filter(merged, x -> array_contains(kb, x))) AS BIGINT)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        when(col("m_a") > 0,
          expr("(CAST(1000000 AS BIGINT) * m_ab) div m_a"))
          .as("c_a_in_b_millionths"),
        when(col("m_b") > 0,
          expr("(CAST(1000000 AS BIGINT) * m_ab) div m_b"))
          .as("c_b_in_a_millionths"))
  }

  /** Incremental sketch refresh — e14's frozen-artifact ingest contract
    * applied to synopses: bottom-k(A ∪ B) is computable from bottom-k(A)
    * and B's raw hashes alone (any union-bottom-k element is in K(A) or
    * in B), so absorbing a new ingest batch costs O(k + |batch shingles|)
    * and NEVER re-reads the old corpus. Output: (g, kmv) — groups only in
    * the old sketches carry over verbatim, groups only in the batch get a
    * fresh sketch, shared groups merge. Spec-pinned: refresh(old half,
    * new half) ≡ from-scratch over the whole, bit-for-bit. The exact
    * `n_distinct` is NOT derivable from a sketch plus a batch (elements
    * outside the sketch are unobservable) — maintain it with the ingest's
    * own counter, or use the KMV estimator (k−1)/U(k) from the refreshed
    * sketch (Beyer et al. 2007). */
  def refreshSketches(
      oldSketches: DataFrame,
      batch: DataFrame,
      k: Int = 128,
      shingleK: Int = 3,
      groupCol: String = "source",
      textCol: String = "text"
  ): DataFrame = {
    require(k >= 1, s"refreshSketches: k must be >= 1, got $k")
    val newH = batch
      .select(col(groupCol).as("g"),
        TextFunctions.words(col(textCol)).as("ws"))
      .select(col("g"),
        explode(TextFunctions.shingles(col("ws"), shingleK)).as("sh"))
      .select(col("g"), md5(col("sh")).as("h"))
    val oldH = oldSketches.select(col("g"), explode(col("kmv")).as("h"))
    oldH.unionByName(newH).distinct()
      .groupBy(col("g"))
      .agg(graft.expressions.TopKBy.topkBy(revHex(col("h")), col("h"), k)
        .as("top"))
      .select(col("g"), expr("transform(top, s -> s.payload)").as("kmv"))
  }

  def pairEstimates(sketches: DataFrame, k: Int = 128): DataFrame = {
    val a = sketches.select(col("g").as("src_a"), col("kmv").as("ka"),
      col("n_distinct").as("n_a"))
    val b = sketches.select(col("g").as("src_b"), col("kmv").as("kb"),
      col("n_distinct").as("n_b"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("merged",
        expr(s"slice(array_sort(array_union(ka, kb)), 1, $k)"))
      .withColumn("est_inter",
        expr("""CAST(size(filter(merged,
          x -> array_contains(ka, x) AND array_contains(kb, x))) AS BIGINT)"""))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        expr("(CAST(1000000 AS BIGINT) * est_inter) div CAST(size(merged) AS BIGINT)")
          .as("j_est_millionths"))
  }
}
