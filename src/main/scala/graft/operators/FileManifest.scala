package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max statistics manifest — the poor-man's Iceberg/Delta
  * manifest on plain parquet: a tiny stored table of (file, rows, per-
  * column min/max) built once at write time; a range query intersects its
  * predicate with the ranges and hands Spark ONLY the surviving files.
  *
  * Why this exists when parquet already has footer stats: the footer must
  * be OPENED per file per query — at 100 TB with 10⁶ files that is 10⁶
  * remote reads (and their latency) before the first row group is
  * considered. The manifest turns file-level skipping into ONE scan of a
  * KB-scale metadata table. The three scan levers now stack cleanly:
  * partition pruning (pp01/pp02) skips directories from the listing,
  * the manifest skips FILES from a stored table, footer stats skip ROW
  * GROUPS inside the files that survive. [[Layout.zorderWrite]] is the
  * write-side half: clustering makes per-file ranges tight, which is what
  * gives the intersection test its selectivity (z01 measures the
  * clustering; z02 measures the skip).
  *
  * Freshness contract: the manifest describes the files it was built
  * from. Rebuild (or incrementally append, same groupBy over the new
  * files) after Merge/Compaction rewrites — same discipline as any
  * secondary index.
  */
object FileManifest {

  final case class PruneStats(filesTotal: Long, filesSelected: Long)

  /** Build the manifest for `cols` over every file of the table at
    * `tablePath` and store it at `manifestPath`. One scan of the table
    * (column-pruned to `cols`) — the write-time cost; at corpus scale
    * this rides the ingest job that just wrote the files. */
  def build(
      spark: SparkSession,
      tablePath: String,
      cols: Seq[String],
      manifestPath: String
  ): Unit = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)
  }

  final case class RefreshStats(filesAdded: Long, filesDropped: Long, filesKept: Long)

  /** Incremental refresh after the table changed (Merge commit,
    * Compaction, new ingest files): stats are computed ONLY for files not
    * yet in the manifest, rows for vanished files are dropped, everything
    * else is carried over untouched — the manifest update rides the
    * ingest delta instead of rescanning the table. This is the freshness
    * half of the manifest contract; a daily-ingest layout refreshes in
    * O(|today's files|). */
  def refresh(
      spark: SparkSession,
      tablePath: String,
      cols: Seq[String],
      manifestPath: String
  ): RefreshStats = {
    require(cols.nonEmpty, "cols must be non-empty")
    val current = spark.read.parquet(tablePath).inputFiles.toSet
    val m = spark.read.parquet(manifestPath)
    val known = m.select("file").collect().map(_.getString(0)).toSet
    val added = (current -- known).toSeq.sorted
    val dropped = known -- current
    val kept = m.filter(col("file").isin((known & current).toSeq: _*))
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val fresh =
      if (added.isEmpty) kept
      else kept.unionByName(
        spark.read.parquet(added: _*)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*))
    // stage beside, then swap — the manifest is read by the union above,
    // and a half-written manifest must never be observable
    val staging = s"${manifestPath.stripSuffix("/")}__staging"
    fresh.coalesce(1).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)
    val sp = new org.apache.hadoop.fs.Path(staging)
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
    RefreshStats(added.length.toLong, dropped.size.toLong,
      (known & current).size.toLong)
  }

  /** Files whose [min, max] range intersects every `(col, lo, hi)`
    * predicate. Files with NULL stats for a predicated column are KEPT
    * (all-null files can't prove non-overlap — conservative, never
    * wrong). */
  private def selectFiles(
      spark: SparkSession,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)]
  ): (Seq[String], PruneStats) = {
    val m = spark.read.parquet(manifestPath)
    val total = m.count()
    val cond = ranges.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo))
    }.reduceOption(_ && _).getOrElse(lit(true))
    val files = m.filter(cond).select("file").collect().map(_.getString(0)).toSeq
    (files, PruneStats(total, files.length.toLong))
  }

  /** Pruning-aware COUNT: files whose stats prove FULL containment in the
    * range contribute their stored `n_rows` without being touched; only
    * boundary files (intersecting but not contained) are scanned, with
    * the row filter applied. At 100 TB a count over a clustered column
    * costs a manifest scan plus the two boundary files — the
    * metadata-only count a table format's planner performs. NULL-stats
    * files are never counted as contained (they get scanned). */
  def countFast(
      spark: SparkSession,
      tablePath: String,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)]
  ): (Long, PruneStats) = {
    require(ranges.nonEmpty, "ranges must be non-empty")
    val m = spark.read.parquet(manifestPath)
    val intersects = ranges.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo))
    }.reduce(_ && _)
    val contained = ranges.map { case (c, lo, hi) =>
      col(s"min_$c").isNotNull && col(s"max_$c").isNotNull &&
        col(s"min_$c") >= lit(lo) && col(s"max_$c") <= lit(hi)
    }.reduce(_ && _)
    val rows = m.filter(intersects)
      .select(col("file"), col("n_rows"), contained.as("__in"))
      .collect()
    val free = rows.filter(_.getBoolean(2)).map(_.getLong(1)).sum
    val boundary = rows.filterNot(_.getBoolean(2)).map(_.getString(0)).toSeq
    val rowFilter = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val scanned =
      if (boundary.isEmpty) 0L
      else spark.read.parquet(boundary: _*).filter(rowFilter).count()
    (free + scanned, PruneStats(m.count(), boundary.length.toLong))
  }

  /** Build with per-file BLOOM FILTERS alongside the min/max stats: point
    * lookups on high-cardinality columns that range stats cannot prune
    * (unique keys interleaved across files by a multi-column layout)
    * prune by membership instead. Reuses the engine's own
    * BloomFilterAggregate ([[RuntimeFilter.bloomAgg]], xxhash64-keyed);
    * `expectedPerFile` sizes each file's filter (~1.2 KB per 1k keys at
    * 1% FP — the manifest stays KB-scale per file). */
  def buildWithBloom(
      spark: SparkSession,
      tablePath: String,
      rangeCols: Seq[String],
      bloomCols: Seq[String],
      manifestPath: String,
      expectedPerFile: Long = 100000L,
      fpp: Double = 0.01
  ): Unit = {
    require(rangeCols.nonEmpty || bloomCols.nonEmpty, "need at least one indexed column")
    val bits = RuntimeFilter.optimalNumBits(expectedPerFile, fpp)
    val aggs = rangeCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      bloomCols.map(c =>
        RuntimeFilter.bloomAgg(col(c), expectedPerFile, bits).as(s"bloom_$c")) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)
  }

  /** Point-lookup read through the per-file blooms: keeps files whose
    * bloom MIGHT contain any of `values` (no false negatives — a present
    * key's file always survives), scans only those, applies the exact
    * `isin` filter. The membership test runs ON the manifest scan (one
    * row per file; the blooms never leave the executors — at 10⁶ files
    * collecting MB-scale blooms to the driver would itself be the
    * bottleneck); only surviving file NAMES are collected. */
  def prunedReadPoint(
      spark: SparkSession,
      tablePath: String,
      manifestPath: String,
      column: String,
      values: Seq[Any]
  ): (DataFrame, PruneStats) = {
    require(values.nonEmpty, "values must be non-empty")
    // hash through the ENGINE's xxhash64 so insertion and probe agree on
    // the key transform byte-for-byte
    val hashes = spark.range(1)
      .select(values.map(v => xxhash64(lit(v))).toIndexedSeq: _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    val mightAny = udf { (bytes: Array[Byte]) =>
      val bf = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      hashes.exists(bf.mightContainLong)
    }
    val m = spark.read.parquet(manifestPath)
    val total = m.count()
    val files = m.filter(mightAny(col(s"bloom_$column")))
      .select("file").collect().map(_.getString(0)).toSeq
    val df =
      if (files.isEmpty) spark.read.parquet(tablePath).filter(lit(false))
      else spark.read.parquet(files: _*)
        .filter(col(column).isin(values: _*))
    (df, PruneStats(total, files.length.toLong))
  }

  /** Range read through the manifest: scans ONLY the intersecting files,
    * then applies the row-level predicate (stats prune files; rows inside
    * a surviving file still need the filter). Result is row-identical to
    * the full scan with the same predicate — layout and stats must never
    * change answers. */
  def prunedRead(
      spark: SparkSession,
      tablePath: String,
      manifestPath: String,
      ranges: Seq[(String, Any, Any)]
  ): (DataFrame, PruneStats) = {
    val (files, stats) = selectFiles(spark, manifestPath, ranges)
    val rowFilter = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduceOption(_ && _).getOrElse(lit(true))
    val df =
      if (files.isEmpty)
        // nothing intersects: an empty frame with the table's schema (one
        // listing, zero data reads)
        spark.read.parquet(tablePath).filter(lit(false))
      else spark.read.parquet(files: _*).filter(rowFilter)
    (df, stats)
  }
}
