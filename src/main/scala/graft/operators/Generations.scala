package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Generation-directory discipline for stored artifacts that pair an
  * occasionally-rewritten BASE with accumulating committed BATCH
  * directories ([[ClosureStore]], [[EditDistance]]'s segment index).
  * The hazard this exists for: rewriting the base of a LIVE store in
  * place leaves the old batch directories beside the new base, and the
  * composed read silently duplicates (or stales) everything they carry —
  * a plausible wrong answer, not an error. Under generations, base and
  * batches live inside ONE `gen-NNNNNNN` directory:
  *
  *   - a rewrite (bootstrap-over-live or compaction) stages the next
  *     generation COMPLETE under a dot-prefixed name and publishes it
  *     with a SINGLE atomic rename — the commit point;
  *   - readers always resolve the HIGHEST committed generation, so every
  *     crash point of a rewrite leaves the previous generation fully
  *     readable (staging is invisible; a crash after the rename but
  *     before old-generation cleanup leaves two complete generations and
  *     readers pick the newer);
  *   - superseded generations are deleted only after the rename lands,
  *     and the IMMEDIATELY-PREVIOUS generation is retained one cycle as
  *     a reader grace window: a job holding a lazy frame resolved
  *     against the old generation keeps scanning files that still exist
  *     while the writer moves on (it is reclaimed by the next publish —
  *     readers slower than a whole maintenance cycle should
  *     re-resolve).
  *
  * Single-writer means ONE writer across BOTH write families: batch
  * commits (advance/appendIndex) and base rewrites (build/compact) must
  * be serialized by the caller — a batch commit racing a rewrite could
  * otherwise land its directory inside the generation the rewrite is
  * superseding, and the new generation's ledger would lack the batch id
  * while the streaming checkpoint records it delivered: the batch's
  * data silently gone with no replay. Defense in depth for the races
  * the contract forbids: batch committers re-resolve the current
  * generation AFTER their rename and fail loud if it moved (the
  * ClosureStore.advance / EditDistance.appendIndex post-commit probe),
  * so a violated contract surfaces as an exception and a replay, never
  * as silent loss. Cross-component torn protection WITHIN a generation
  * stays [[ArtifactStamp]]'s job. Flat layouts predating the generation
  * structure are NOT migrated: reads fail loud (below) and a fresh
  * build publishes `gen-0000001` beside — not composed with — any
  * flat-layout files.
  *
  * Naming is zero-padded but NOT width-bounded: matching is `\d{7,}`
  * and ordering is NUMERIC on the parsed sequence, so generation
  * 10 000 000 (which a 7-char-fixed regex would make invisible — the
  * published store would vanish from readers) stays resolvable, just
  * no longer lexicographically sorted on disk.
  */
private[operators] object Generations {

  private val Name = "gen-(\\d{7,})".r

  /** The numeric sequence a committed generation directory carries. */
  def genSeq(dir: String): Long =
    dir.substring(dir.lastIndexOf('/') + 1).drop(4).toLong

  private def hadoopFs(spark: SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed generation directories, ascending by NUMERIC sequence
    * (lexicographic order breaks once a sequence outgrows the 7-char
    * zero padding: "gen-10000000" < "gen-9999999" as strings). Staging
    * is dot-prefixed and never matches. */
  def dirs(spark: SparkSession, path: String): Seq[String] = {
    val fs = hadoopFs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .filter(s => Name.pattern.matcher(s.getPath.getName).matches())
      .map(_.getPath.toString).sortBy(genSeq)
  }

  /** The live generation — the highest committed `gen-NNNNNNN`; fails
    * loud naming `what` when the store was never built. */
  def current(spark: SparkSession, path: String, what: String): String = {
    val gens = dirs(spark, path)
    require(gens.nonEmpty,
      s"no $what at $path — build it first (note: a store written by a " +
        "pre-generation flat layout is not auto-migrated; rebuild from the " +
        "full corpus, which also carries no flat-layout replay ledger — " +
        "prefer a fresh path)")
    gens.last
  }

  /** The replay ledger a generation carries (`ingested/`, one
    * `batch_id` string column): every batch id folded into the base by
    * compaction or carried across a rebuild, so batch-ingested probes
    * stay truthful after the batch directories themselves are gone. */
  def readLedger(spark: SparkSession, gen: String): Set[String] =
    spark.read.parquet(s"$gen/ingested")
      .select(col("batch_id").cast("string"))
      .collect().map(_.getString(0)).toSet

  /** The ledger the NEXT generation must carry: the live generation's
    * ledger ∪ its live batch ids (`liveBatchIds` extracts them from a
    * generation directory — stores differ in batch-dir naming), empty
    * for a fresh store. Shared by compaction and rebuild so the two
    * paths can never diverge on replay protection. */
  def carriedLedger(spark: SparkSession, path: String,
      liveBatchIds: String => Seq[String]): Seq[String] =
    dirs(spark, path).lastOption.toSeq.flatMap { gen =>
      (readLedger(spark, gen) ++ liveBatchIds(gen)).toSeq.sorted
    }

  /** Committed batch directories of a generation as (batchId, dir) pairs,
    * ascending id — the RAW-named layout (`batches/<batchId>`) shared by
    * the EditDistance / VectorIndex / Winnowing stores, where commit
    * order carries no read semantics (their reads are plain unions).
    * ClosureStore keeps its own seq-prefixed naming: its merge-on-read
    * edge masking depends on commit order. Staging dirs are dot-prefixed
    * and never listed. */
  def listBatches(spark: SparkSession, gen: String): Seq[(String, String)] = {
    val fs = hadoopFs(spark, gen)
    val root = new org.apache.hadoop.fs.Path(s"$gen/batches")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(s => (s.getPath.getName, s.getPath.toString)).sortBy(_._1)
  }

  /** Has `batchId` been committed into the live generation's `batches/`
    * or absorbed into its replay ledger? The idempotence probe every
    * retrying or replaying ingest job runs before a [[commitBatch]]. */
  def batchKnown(spark: SparkSession, path: String, what: String,
      batchId: String): Boolean = {
    val gen = current(spark, path, what)
    listBatches(spark, gen).exists(_._1 == batchId) ||
      readLedger(spark, gen).contains(batchId)
  }

  /** Atomically commit one batch into generation `gen` (raw-named
    * layout): `write` fills a dot-prefixed staging directory (leftovers
    * of a crashed attempt are restaged whole), ONE rename publishes it
    * as `batches/<batchId>`, then the current generation is re-resolved
    * and the commit fails loud if a concurrent rewrite superseded it —
    * the single-writer defense: a batch stranded in a superseded
    * generation would otherwise be silently invisible to readers while
    * the caller's checkpoint records it delivered. `dupMsg` is the
    * store-specific consequence line of a duplicate commit (what a
    * double-ingest would silently corrupt). */
  def commitBatch(spark: SparkSession, path: String, gen: String,
      what: String, batchId: String, dupMsg: String)(
      write: String => Unit): Unit = {
    require(batchId.nonEmpty && !batchId.exists(c => c == '/' || c == '.'),
      s"batchId must be a plain directory name, got '$batchId'")
    if (batchKnown(spark, path, what, batchId))
      throw new IllegalStateException(
        s"$what at $path already ingested batch '$batchId' — $dupMsg; " +
          "probe the ingest state before appending, or pick a new batch id")
    val fs = hadoopFs(spark, gen)
    val staging = new org.apache.hadoop.fs.Path(s"$gen/.batch-$batchId.inprogress")
    fs.delete(staging, true) // leftover from a crashed attempt: restage whole
    write(staging.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$gen/batches"))
    require(fs.rename(staging,
        new org.apache.hadoop.fs.Path(s"$gen/batches/$batchId")),
      s"$what commit of batch '$batchId' failed to publish " +
        "(concurrent append of the same id?)")
    if (current(spark, path, what) != gen)
      throw new IllegalStateException(
        s"$what batch '$batchId' committed into a generation that a " +
          s"concurrent rewrite superseded ($gen) — batch commits and " +
          "rewrites must be serialized by one writer; replay the batch")
  }

  /** Publish the next generation: `write` fills the staged directory,
    * `parts` names the components to stamp with one fresh generation id
    * ([[ArtifactStamp]]), then ONE rename commits and superseded
    * generations are best-effort deleted. A crash before the rename
    * leaves the old generation untouched; after it, readers already
    * resolve the new one. */
  def publish(spark: SparkSession, path: String,
      parts: String => Seq[String])(write: String => Unit): Unit = {
    val fs = hadoopFs(spark, path)
    val old = dirs(spark, path)
    val seq = old.lastOption.map(genSeq).getOrElse(0L) + 1
    val name = f"gen-$seq%07d"
    val staging = new org.apache.hadoop.fs.Path(s"$path/.$name.inprogress")
    fs.delete(staging, true) // leftover from a crashed attempt: restage whole
    write(staging.toString)
    ArtifactStamp.stampAll(spark, parts(staging.toString))
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    require(fs.rename(staging, new org.apache.hadoop.fs.Path(s"$path/$name")),
      s"generation publish of $name under $path failed (concurrent rewrite?)")
    // keep the immediately-previous generation one cycle (reader grace —
    // in-flight lazy frames resolved before this publish keep their
    // files); everything older is reclaimed now
    old.dropRight(1).foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }
}
