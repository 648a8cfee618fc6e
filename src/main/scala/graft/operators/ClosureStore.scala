package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STORED contamination-closure state — the daily steady state of the
  * d53 composition ([[Dedup.chunkShareEdges]] → [[Graph.reachableFrom]]).
  * A from-scratch spread query re-pays, every day, (a) the full-text
  * chunking of the ENTIRE corpus and (b) every historical BFS round —
  * for an ingest that added a few percent of documents. This store keeps
  * the three artifacts yesterday's run already computed, so today's run
  * pays only for today:
  *
  *   - `postings/` — distinct (doc_id, fp) chunk occurrences
  *     ([[Dedup.chunkPostings]]): the expensive text explode, paid once
  *     per document ever.
  *   - `edges/` — per-chunk star edges (fp, a_id, b_id)
  *     ([[Dedup.chunkShareEdgesFromPostings]]): the fp column is what
  *     makes incremental maintenance possible — a new batch touches a
  *     known set of chunks, and exactly those chunks' stars are swapped.
  *   - `closure/` — (node, depth), every node reachable from the seed
  *     set over the symmetrized share graph.
  *   - `meta/` — pins `chunk_words`: the fingerprint scheme is a
  *     function of it, and probing with a different value would produce
  *     disjoint fps and a silently-empty delta ([[EditDistance]]'s
  *     maxDist-pin precedent). Reads fail loud on mismatch.
  *
  * [[foldDelta]] then chunks ONLY the new documents, recomputes stars
  * for ONLY the touched chunks (one semi join of the stored postings
  * against the delta's chunk set), carries every untouched star over
  * unchanged (one anti join over the stored edges — a single key-bounded
  * pass over a stored table, the irreducible cost of consulting state),
  * and folds the edge delta into the stored closure with
  * [[Graph.incrementalReachable]] — BFS rounds proportional to the
  * newly-reachable region, never to history. Correctness does not
  * depend on hubs staying put: a new document can MOVE a chunk's hub
  * (min doc id), so that chunk's old spokes vanish and new ones appear —
  * but star components are hub-invariant and sharing is monotone, so
  * connectivity never shrinks and every escape from the stored closure
  * still crosses a delta edge (the g08 oracle pins set-equality with the
  * from-scratch closure over the union corpus).
  *
  * Torn-state safety: all four directories are stamped with ONE
  * generation id after the writes ([[ArtifactStamp]] — the
  * [[FileManifest]] stamp mechanism); [[foldDelta]] verifies the stamps
  * align and fails loud otherwise, so a crash between component writes
  * (or a partial rebuild) can never silently join yesterday's closure
  * against today's edges. Document ids must be unique ACROSS the store
  * and every folded batch.
  */
object ClosureStore {

  private def parts(path: String): Seq[String] =
    Seq(s"$path/postings", s"$path/edges", s"$path/closure", s"$path/meta")

  /** Bootstrap the store from scratch: chunk `docs`, derive the star
    * edges, run the full BFS from `seeds` (one-column id frame), write
    * and stamp all four components. This is the once-per-corpus cost;
    * every subsequent day is [[foldDelta]]. */
  def build(
      docs: DataFrame,
      seeds: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkWords: Int = 8
  ): Unit = {
    val spark = docs.sparkSession
    val postings = Dedup.chunkPostings(docs, idCol, textCol, chunkWords)
    postings.write.mode("overwrite").parquet(s"$path/postings")
    val stored = spark.read.parquet(s"$path/postings")
    Dedup.chunkShareEdgesFromPostings(stored)
      .write.mode("overwrite").parquet(s"$path/edges")
    val edges = spark.read.parquet(s"$path/edges")
    Graph.reachableFrom(sym(edges), seeds, srcCol = "a_id", dstCol = "b_id")
      .write.mode("overwrite").parquet(s"$path/closure")
    spark.range(1).select(lit(chunkWords).as("chunk_words"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    ArtifactStamp.stampAll(spark, parts(path))
  }

  private def sym(star: DataFrame): DataFrame =
    star.select(col("a_id"), col("b_id")).unionAll(
      star.select(col("b_id").as("a_id"), col("a_id").as("b_id")))

  /** Today's closure over (stored corpus ∪ `newDocs`), with `newSeeds`
    * (one-column id frame, e.g. today's flagged documents) joining the
    * seed set at depth 0 — SET-identical to rebuilding from scratch over
    * the union, at delta cost: chunking is |newDocs|-proportional, star
    * recomputation touches only chunks the batch occurs in, and the BFS
    * expands only the newly-reachable region. The store itself is not
    * advanced — run [[build]] over the union on whatever cadence full
    * compaction is worth (the stored postings/edges/closure remain valid
    * inputs for every fold until then). */
  def foldDelta(
      newDocs: DataFrame,
      newSeeds: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = newDocs.sparkSession
    ArtifactStamp.verifyAligned(spark, "ClosureStore", parts(path))
    val chunkWords =
      spark.read.parquet(s"$path/meta").head().getAs[Int]("chunk_words")
    val storedPostings = spark.read.parquet(s"$path/postings")
    val storedEdges = spark.read.parquet(s"$path/edges")
    val closure = spark.read.parquet(s"$path/closure")

    // delta-sized text explode; materialized — it feeds the touched-chunk
    // set, the star recomputation, and (via those) two join sides
    val newPostings = Dedup
      .chunkPostings(newDocs, idCol, textCol, chunkWords)
      .localCheckpoint(true)
    val touched = newPostings.select("fp").distinct()
    // full occurrence set of exactly the touched chunks: stored postings
    // semi-joined to the delta's chunk keys + the delta's own rows
    val touchedPostings = storedPostings
      .join(touched, Seq("fp"), "left_semi")
      .unionByName(newPostings)
    val recomputed = Dedup.chunkShareEdgesFromPostings(touchedPostings)
      .select(col("a_id"), col("b_id")).distinct()
      .localCheckpoint(true) // consumed by the full graph AND the delta
    // stars of untouched chunks carry over verbatim — their posting sets
    // did not change, so neither did their hubs or spokes
    val untouched = storedEdges.join(touched, Seq("fp"), "left_anti")
      .select(col("a_id"), col("b_id"))
    val fullEdges = untouched.unionByName(recomputed)
    val deltaEdges = recomputed.join(
      storedEdges.select(col("a_id"), col("b_id")),
      Seq("a_id", "b_id"), "left_anti")

    // a "new" seed already inside the stored closure would duplicate its
    // node row (stored depth + depth 0) — drop those before the union
    val seedRows = newSeeds
      .select(col(newSeeds.columns.head).cast("long").as("node")).distinct()
      .join(closure.select(col(closure.columns.head).as("node")),
        Seq("node"), "left_anti")
      .withColumn("depth", lit(0))
    // smallFrontier: the fold's BFS frontiers are bounded by the DELTA's
    // newly-reachable region — levels of node ids from one ingest batch,
    // the same delta-sized-broadcast contract as the CDC retract path.
    // A bulk backfill folded through this API should rebuild instead
    // (or call Graph.incrementalReachable directly with the default).
    Graph.incrementalReachable(
      closure.unionByName(seedRows, allowMissingColumns = false),
      sym(fullEdges), sym(deltaEdges), srcCol = "a_id", dstCol = "b_id",
      smallFrontier = true)
  }
}
