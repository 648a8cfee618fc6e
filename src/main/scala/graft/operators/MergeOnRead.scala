package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ deletes via an equality-delete sidecar — the other half
  * of the deletion design space from [[Merge.delete]]'s copy-on-write:
  * a COW delete pays a partition rewrite at REQUEST time, which is the
  * wrong trade for the common 100 TB case (a GDPR batch touching 0.01%
  * of rows spread over thousands of directories). Merge-on-read flips
  * the cost: the delete itself is an O(|keys|) append to a sidecar
  * table, readers subtract the sidecar with one broadcast anti-join,
  * and the physical rewrite is deferred to a maintenance window that
  * FOLDS the accumulated deletes through the normal COW path. This is
  * Iceberg v2's equality-delete + rewrite mechanism re-expressed on
  * plain directories (same family as the repo's manifest: stored
  * KB-scale metadata standing in for per-query data work).
  *
  * Layout: the sidecar lives INSIDE the table at `<path>/_deletes`.
  * Underscore-prefixed paths are invisible to Spark's file index (the
  * `_metadata`/`_SUCCESS` convention), so a plain `read.parquet(path)`
  * scan never sees it — un-upgraded readers observe the pre-delete
  * table rather than corrupt rows, and [[Compaction.stats]]'s
  * partition walk skips it (it only descends `col=value` dirs).
  *
  * Reference tie-in: the reference's ES sink deletes by document id and
  * lets the store resolve visibility (docs/usage.rst:285-295); on a
  * filesystem corpus the sidecar IS that visibility layer until fold.
  *
  * Semantics: equality deletes on `keyCols`. A key appended twice is
  * deleted once (reads and folds both distinct the sidecar) — retried
  * delete jobs converge. Keys must ship their partition-column values
  * (fold's prune set travels with the key, u02's contract); NULL keys
  * never match (ship real keys).
  */
object MergeOnRead {

  private def deleteDir(path: String): String =
    s"${path.stripSuffix("/")}/_deletes"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Record `keys` (with their partition values) as deleted: an append
    * of O(|keys|) rows — no table data is read or written. Returns the
    * number of delete rows appended. */
  def appendDeletes(
      spark: SparkSession,
      path: String,
      keys: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String]
  ): Long = {
    require(keyCols.nonEmpty && partCols.nonEmpty,
      "keyCols and partCols must be non-empty")
    val sel = keys.select((keyCols ++ partCols).map(col): _*).distinct()
      .persist()
    val n = sel.count()
    // one small file per delete batch is the point — fold clears them;
    // a delete request must never trigger a data rewrite
    sel.coalesce(1).write.mode("append").parquet(deleteDir(path))
    sel.unpersist()
    n
  }

  /** The read path: table minus sidecar, as one LEFT ANTI join on the
    * keys. `broadcastDeletes` (default) pins the broadcast strategy —
    * the sidecar is delete-batch-sized metadata; set it false once an
    * unfolded backlog outgrows the broadcast threshold (at which point
    * you should be folding, not reading around it). No sidecar → the
    * plain scan, zero overhead. */
  def read(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      broadcastDeletes: Boolean = true
  ): DataFrame = {
    val target = spark.read.parquet(path)
    val dd = deleteDir(path)
    if (!exists(spark, dd)) target
    else {
      val dels = spark.read.parquet(dd)
        .select(keyCols.map(col): _*).distinct()
      target.join(
        if (broadcastDeletes) broadcast(dels) else dels,
        keyCols, "left_anti")
    }
  }

  /** Maintenance fold: apply the accumulated sidecar physically through
    * [[Merge.delete]] (partition-pruned COW — |touched partitions|, not
    * |history|), then clear the sidecar. Ordering makes a crash safe:
    * the sidecar is removed only AFTER the COW commit, and re-folding
    * already-applied keys deletes nothing (anti-join finds no match) —
    * idempotent by construction. `manifestPath` flows through to the
    * commit's manifest refresh ([[FileManifest]]'s freshness contract).
    * Returns the COW stats; a missing/empty sidecar is a no-op. */
  def fold(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      partCols: Seq[String],
      manifestPath: Option[String] = None
  ): Merge.MergeStats = {
    val dd = deleteDir(path)
    if (!exists(spark, dd)) return Merge.MergeStats(0L, 0L, 0L, 0L)
    val keys = spark.read.parquet(dd).distinct()
    val st = Merge.delete(spark, path, keys, keyCols, partCols, manifestPath)
    val p = new org.apache.hadoop.fs.Path(dd)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    st
  }
}
