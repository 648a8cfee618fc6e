package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (upsert / delete) over a hive-partitioned parquet
  * layout WITHOUT a table format — copy-on-write with a partition-pruned
  * rewrite, the mechanism Delta/Hudi/Iceberg COW tables use under the
  * MERGE keyword, re-expressed on plain directories.
  *
  * Reference tie-in: the reference's sinks are append-only indexers
  * (docs/usage.rst:285-295 — the ES writer upserts by document id, the
  * store resolves the key collision). On a filesystem corpus nothing
  * resolves collisions for you; this operator IS that resolution step for
  * the curated-parquet layout the rest of the engine reads.
  *
  * At 100 TB the contract that matters is WHAT gets rewritten: cost is
  * proportional to the partitions the change-batch actually touches
  * (|today|), never to the table (|history|). Mechanics:
  *
  *   1. The touched-partition set comes from the batch itself (its
  *      partition-column values — for deletes the caller ships them with
  *      the keys; a change feed that cannot name its partitions forces a
  *      full scan, so don't build one).
  *   2. The target read is partition-pruned to that set (`isin` on the
  *      partition columns → the scan's PartitionFilters; directories
  *      outside the set are never listed, opened, or footer-read).
  *   3. Matched rows are dropped by a LEFT ANTI join on the key — the only
  *      shuffle, sized by the touched partitions, AQE-skew-splittable.
  *   4. Survivors ∪ batch are staged to a side directory, then committed
  *      with dynamic partition overwrite — only the touched directories
  *      are replaced; every other partition's files are not even read.
  *      The staging hop exists because Spark (correctly) refuses to
  *      overwrite a path it is currently reading ("Cannot overwrite a
  *      path that is also being read from") — the same
  *      write-new-files-then-swap discipline a table format's commit
  *      protocol enforces, minus the manifest.
  *
  * Idempotence: re-applying the same batch replaces the same rows with
  * the same rows (anti-join drops what the union re-adds), so a retried
  * ingest job converges — the batch analog of the streaming side's
  * `idempotentForeachBatchSink`.
  *
  * Key-null discipline: rows whose key is NULL never equi-match, so NULL-
  * keyed target rows always survive and NULL-keyed batch rows always
  * insert. Ship real keys.
  *
  * Delete has one trap upsert does not: dynamic partition overwrite only
  * replaces directories PRESENT in the written data, so a partition whose
  * rows are ALL deleted produces no output rows, no staged directory — and
  * would silently keep its old files. [[delete]] removes those directories
  * explicitly after the commit.
  */
object Merge {

  /** Applied-change summary (all counts are rows/directories actually
    * touched — the observability a MERGE needs to be trusted). */
  final case class MergeStats(
      partitionsTouched: Long,
      targetRowsBefore: Long,
      rowsReplaced: Long,
      rowsWritten: Long
  )

  private def partTuples(
      df: DataFrame, partCols: Seq[String]): Array[Seq[Any]] = {
    val t = df.select(partCols.map(col): _*).distinct().collect()
      .map(r => partCols.indices.map(r.get): Seq[Any])
    // the collect is bounded driver METADATA by the layout contract
    // (partition columns are low-cardinality row properties); a batch
    // naming 10^5+ partitions means the partitioning is too fine for a
    // COW merge — flag it loudly before the commit fans out
    if (t.length > 100000)
      org.slf4j.LoggerFactory.getLogger("graft.operators.Merge").warn(
        s"change batch touches ${t.length} partitions — the touched-set " +
          "collect and per-directory commit scale with this; coarsen the " +
          "partitioning or split the batch")
    t
  }

  /** `isin`-conjunction over the touched partition tuples: resolves to the
    * scan's PartitionFilters (static pruning — EntrySpec-style guard in
    * MergeSpec). Partition columns are low-cardinality by layout contract
    * (days, languages, years — the same rule `Sinks.parquetPartitioned`
    * documents), so collecting the distinct tuples is bounded driver
    * metadata, not data. */
  private def touchedFilter(
      tuples: Array[Seq[Any]], partCols: Seq[String]): Column =
    tuples.map { t =>
      partCols.zip(t).map { case (c, v) =>
        // plain === (not <=>): null-intolerant equality is the shape the
        // partition-pruning rule recognizes; null partition values are a
        // layout smell and excluded from the contract.
        require(v != null, s"null partition value for $c in the change batch")
        col(c) === lit(v)
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** Stage `out` beside `path`, then commit it with dynamic partition
    * overwrite and drop the staging directory. */
  private[operators] def stageAndCommit(
      spark: SparkSession, out: DataFrame, path: String,
      partCols: Seq[String]): Unit = {
    // Sibling, never inside `path`: parquet's "cannot overwrite a read
    // path" guard and hive partition discovery both want the target tree
    // to contain only `col=value` directories.
    val staging = s"${path.stripSuffix("/")}__graft_staging"
    out.write.mode("overwrite").partitionBy(partCols: _*).parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*).parquet(path)
    rmDir(spark, staging)
  }

  private[operators] def rmDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Upsert `batch` into the partitioned parquet table at `path`: rows
    * matching on `keyCols` are replaced by their batch row, the rest of the
    * batch inserts. `batch` must carry the partition columns (they name the
    * directories to rewrite). A key that MOVES partitions in the batch is
    * replaced only if its old row lives in a touched partition — a moving
    * key whose old partition is untouched would duplicate; partition
    * columns should be stable row properties (event date, language), not
    * mutable attributes. */
  def upsert(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      manifestPath: Option[String] = None
  ): MergeStats = {
    require(keyCols.nonEmpty && partCols.nonEmpty, "keyCols and partCols must be non-empty")
    val tuples = partTuples(batch, partCols)
    if (tuples.isEmpty) return MergeStats(0L, 0L, 0L, 0L)

    val target = spark.read.parquet(path)
    val affected = target.filter(touchedFilter(tuples, partCols))
    val before = affected.count()
    val survivors = affected.join(
      batch.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val out = survivors.unionByName(batch.select(target.columns.map(col): _*))
    val written = out.persist()
    val nWritten = written.count()
    // generation bump BEFORE the first file mutation: a crash anywhere
    // between here and the refresh leaves table gen ≠ manifest gen, and
    // every manifest read path fails loud instead of serving vanished
    // files (FileManifest's crash-safety contract)
    FileManifest.bumpGeneration(spark, path)
    stageAndCommit(spark, written, path, partCols)
    written.unpersist()
    refreshManifest(spark, path, manifestPath)
    MergeStats(tuples.length.toLong, before,
      rowsReplaced = before - (nWritten - batch.count()) max 0L,
      rowsWritten = nWritten)
  }

  /** The commit's manifest half: a stats manifest ([[FileManifest]]) is a
    * secondary index over the table's FILES, and a COW commit replaces
    * files — so the commit itself refreshes it (delta-sized: stats are
    * recomputed only for the rewritten directories' new files). Without
    * this, a post-merge pruned read would hand Spark vanished paths. */
  private def refreshManifest(
      spark: SparkSession, path: String, manifestPath: Option[String]): Unit =
    manifestPath.foreach(mp => FileManifest.refresh(spark, path, mp))

  /** Delete rows matching `keys` on `keyCols`. `keys` must carry the
    * partition columns (the prune set); only those directories are read
    * and rewritten. Partitions whose rows are ALL deleted are removed
    * explicitly (the dynamic-overwrite blind spot documented above). */
  def delete(
      spark: SparkSession,
      path: String,
      keys: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      manifestPath: Option[String] = None
  ): MergeStats = {
    require(keyCols.nonEmpty && partCols.nonEmpty, "keyCols and partCols must be non-empty")
    val tuples = partTuples(keys, partCols)
    if (tuples.isEmpty) return MergeStats(0L, 0L, 0L, 0L)

    val target = spark.read.parquet(path)
    val affected = target.filter(touchedFilter(tuples, partCols))
    val before = affected.count()
    val survivors = affected.join(
      keys.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val written = survivors.persist()
    val nWritten = written.count()
    // bump BEFORE any mutation (commit AND the emptied-directory removals
    // below are one logical commit; the window must cover both)
    FileManifest.bumpGeneration(spark, path)
    if (nWritten > 0) stageAndCommit(spark, written, path, partCols)
    // Directories the delete emptied entirely: touched minus still-present.
    val remaining = partTuples(written, partCols).toSet
    written.unpersist()
    tuples.filterNot(remaining.contains).foreach { t =>
      val dir = partCols.zip(t)
        .map { case (c, v) => s"$c=$v" }.mkString("/", "/", "")
      rmDir(spark, path + dir)
    }
    refreshManifest(spark, path, manifestPath)
    MergeStats(tuples.length.toLong, before,
      rowsReplaced = before - nWritten, rowsWritten = nWritten)
  }
}
