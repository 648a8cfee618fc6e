package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small-file compaction for a hive-partitioned parquet layout — the
  * OPTIMIZE/bin-packing maintenance job every long-lived table needs.
  *
  * Why it exists at 100 TB: a streaming or per-day ingest writes each
  * micro-batch/task as its own file, and a year of that leaves partitions
  * with thousands of KB-scale files. Every downstream scan then pays
  * per-file costs — driver listing, footer reads, task scheduling — that
  * dwarf the data; a 10 000-file day at 1 MB each schedules 10 000 tasks
  * where 8 would do. Compaction rewrites ONLY the offending directories
  * into ~`targetBytes` files and leaves healthy partitions' files
  * physically untouched (same mtimes — the cheap-maintenance contract,
  * spec-asserted).
  *
  * Mechanics (same copy-on-write discipline as [[Merge]]):
  *   1. Driver-side directory listing collects per-partition (files,
  *      bytes) — metadata proportional to file count, the same listing
  *      any scan already performs (and the reference's own source idiom:
  *      the LocalFilesSource directory walk, helpers.py:10-32).
  *   2. A partition needs work when its file count exceeds
  *      max(minFiles, ceil(bytes / targetBytes)).
  *   3. Those partitions are read back partition-pruned, each row gets a
  *      file slot `pmod(hash, nf)` from a broadcast per-partition target
  *      map, and a repartition on (partitionCols, slot) lands each
  *      directory in ≈nf shuffle tasks → ≈nf output files (hash
  *      collisions can merge slots — fewer, larger files, never more).
  *   4. Stage → dynamic partition overwrite → only the compacted
  *      directories are replaced.
  *
  * Row-identical by construction: compaction moves rows between files,
  * never creates/drops/edits them (oracled — c02 replays its aggregate
  * over the never-compacted originals).
  */
object Compaction {

  /** One leaf partition directory's shape. `values` are the raw string
    * partition values in `partCols` order (as encoded in the dir names). */
  final case class PartStats(values: Seq[String], files: Int, bytes: Long)

  final case class CompactStats(
      partitionsCompacted: Int, filesBefore: Int, filesAfter: Int)

  /** Driver-side listing of leaf partition dirs (depth = partCols.length)
    * with parquet file counts/bytes. */
  def stats(spark: SparkSession, path: String,
      partCols: Seq[String]): Seq[PartStats] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path, depth: Int,
        acc: Seq[String]): Seq[PartStats] =
      if (depth == partCols.length) {
        val files = fs.listStatus(p).filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        Seq(PartStats(acc, files.length, files.map(_.getLen).sum))
      } else {
        fs.listStatus(p).toSeq
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith(partCols(depth) + "="))
          .flatMap(s => walk(s.getPath, depth + 1,
            acc :+ s.getPath.getName.drop(partCols(depth).length + 1)))
      }
    if (fs.exists(root)) walk(root, 0, Nil) else Nil
  }

  /** Raw dir-name partition value → an external value of the partition
    * column's actual type, so the pruning filter stays `col = lit` (the
    * shape the partition-pruning rule recognizes — no cast on the column
    * side) and the broadcast target map joins without coercion. */
  private def typed(v: String, dt: DataType): Any = dt match {
    case IntegerType => v.toInt
    case LongType    => v.toLong
    case ShortType   => v.toShort
    case StringType  => v
    case DateType    => java.sql.Date.valueOf(v)
    case BooleanType => v.toBoolean
    case other => throw new IllegalArgumentException(
      s"unsupported partition column type for compaction: $other")
  }

  /** Compact partitions whose file count exceeds
    * max(minFiles, ceil(bytes/targetBytes)). Healthy partitions are not
    * read, not rewritten, not even footer-opened. */
  def compact(
      spark: SparkSession,
      path: String,
      partCols: Seq[String],
      targetBytes: Long,
      minFiles: Int = 1
  ): CompactStats = {
    require(partCols.nonEmpty && targetBytes > 0, "partCols non-empty, targetBytes > 0")
    val all = stats(spark, path, partCols)
    def targetFiles(s: PartStats): Int =
      math.max(minFiles, math.ceil(s.bytes.toDouble / targetBytes).toInt)
    val work = all.filter(s => s.files > targetFiles(s))
    if (work.isEmpty) return CompactStats(0, all.map(_.files).sum, all.map(_.files).sum)

    val target = spark.read.parquet(path)
    val types = partCols.map(c => c -> target.schema(c).dataType).toMap
    val pruneFilter = work.map { s =>
      partCols.zip(s.values)
        .map { case (c, v) => col(c) === lit(typed(v, types(c))) }
        .reduce(_ && _)
    }.reduce(_ || _)

    // per-partition file-count targets, broadcast onto the pruned scan
    val nfRows = work.map(s => org.apache.spark.sql.Row.fromSeq(
      partCols.zip(s.values).map { case (c, v) => typed(v, types(c)) }
        :+ targetFiles(s)))
    val nfSchema = StructType(
      partCols.map(c => StructField(c, types(c))) :+
        StructField("__graft_nf", IntegerType))
    val nfDf = spark.createDataFrame(
      spark.sparkContext.parallelize(nfRows, 1), nfSchema)

    val dataCols = target.columns.filterNot(partCols.contains)
    val slotted = target.filter(pruneFilter)
      .join(broadcast(nfDf), partCols)
      .withColumn("__graft_slot",
        pmod(xxhash64(dataCols.map(col).toIndexedSeq: _*), col("__graft_nf")))
    val spread = slotted
      .repartition((partCols.map(col) :+ col("__graft_slot")): _*)
      .drop("__graft_nf", "__graft_slot")
      .select(target.columns.map(col).toIndexedSeq: _*)

    val staging = s"${path.stripSuffix("/")}__graft_staging"
    spread.write.mode("overwrite").partitionBy(partCols: _*).parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*).parquet(path)
    val sp = new org.apache.hadoop.fs.Path(staging)
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)

    val after = stats(spark, path, partCols)
    CompactStats(work.size, all.map(_.files).sum, after.map(_.files).sum)
  }
}
