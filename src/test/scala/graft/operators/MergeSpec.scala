package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** (relative path, length, mtime) of every data file under a partition
    * dir — the copy-on-write invariant: untouched partitions keep their
    * exact files, byte-for-byte and timestamp-for-timestamp. */
  private def fileSig(path: String, part: String): Set[(String, Long, Long)] = {
    val base = new java.io.File(s"$path/$part")
    if (!base.exists()) Set.empty
    else base.listFiles().filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
  }

  private def base(): DataFrame =
    Seq(
      (1L, "a", 2023, 10.0), (2L, "b", 2023, 20.0), (3L, "c", 2023, 30.0),
      (4L, "d", 2024, 40.0), (5L, "e", 2024, 50.0),
      (6L, "f", 2025, 60.0)
    ).toDF("id", "v", "yr", "amt")

  test("upsert replaces matched rows, inserts the rest, leaves untouched partitions' files alone") {
    val path = tmp("graft-merge-up")
    graft.sources.Sinks.parquetPartitioned(base(), path, Seq("yr"))
    val sig2023 = fileSig(path, "yr=2023")
    val sig2025 = fileSig(path, "yr=2025")

    // touches only 2024: one update (id=4), one insert (id=99)
    val batch = Seq((4L, "D!", 2024, 44.0), (99L, "new", 2024, 99.0))
      .toDF("id", "v", "yr", "amt")
    val st = Merge.upsert(spark, path, batch, Seq("id"), Seq("yr"))
    assert(st.partitionsTouched == 1 && st.targetRowsBefore == 2
      && st.rowsReplaced == 1 && st.rowsWritten == 3)

    val got = spark.read.parquet(path)
      .select("id", "v", "yr", "amt").as[(Long, String, Int, Double)]
      .collect().toSet
    assert(got == Set(
      (1L, "a", 2023, 10.0), (2L, "b", 2023, 20.0), (3L, "c", 2023, 30.0),
      (4L, "D!", 2024, 44.0), (5L, "e", 2024, 50.0), (99L, "new", 2024, 99.0),
      (6L, "f", 2025, 60.0)))
    // COW invariant: 2023/2025 directories untouched (same files, same mtimes)
    assert(fileSig(path, "yr=2023") == sig2023)
    assert(fileSig(path, "yr=2025") == sig2025)
    assert(fileSig(path, "yr=2024") != Set.empty)
  }

  test("upsert is idempotent: re-applying the same batch converges") {
    val path = tmp("graft-merge-idem")
    graft.sources.Sinks.parquetPartitioned(base(), path, Seq("yr"))
    val batch = Seq((4L, "D!", 2024, 44.0), (99L, "new", 2024, 99.0))
      .toDF("id", "v", "yr", "amt")
    Merge.upsert(spark, path, batch, Seq("id"), Seq("yr"))
    val first = spark.read.parquet(path).collect().map(_.toString).sorted
    val st2 = Merge.upsert(spark, path, batch, Seq("id"), Seq("yr"))
    val second = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(first.sameElements(second))
    assert(st2.rowsReplaced == 2 && st2.rowsWritten == 3)
  }

  test("the target read is partition-pruned to the batch's partitions") {
    val path = tmp("graft-merge-prune")
    graft.sources.Sinks.parquetPartitioned(base(), path, Seq("yr"))
    val batch = Seq((4L, "D!", 2024, 44.0)).toDF("id", "v", "yr", "amt")
    // same filter Merge builds internally; assert it resolves to
    // PartitionFilters with the literal year, not a post-scan Filter
    val plan = spark.read.parquet(path).filter(col("yr") === 2024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024"),
      s"expected partition-pruned scan, got:\n$plan")
    Merge.upsert(spark, path, batch, Seq("id"), Seq("yr"))
    assert(spark.read.parquet(path).count() == 6)
  }

  test("delete removes matched keys, drops fully-emptied partition dirs, keeps the rest") {
    val path = tmp("graft-merge-del")
    graft.sources.Sinks.parquetPartitioned(base(), path, Seq("yr"))
    val sig2023 = fileSig(path, "yr=2023")

    // delete id=4 (partial: 2024 keeps id=5) and id=6 (empties 2025)
    val keys = Seq((4L, 2024), (6L, 2025)).toDF("id", "yr")
    val st = Merge.delete(spark, path, keys, Seq("id"), Seq("yr"))
    assert(st.partitionsTouched == 2 && st.targetRowsBefore == 3
      && st.rowsReplaced == 2 && st.rowsWritten == 1)

    val got = spark.read.parquet(path).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 5L))
    // the emptied directory is GONE (the dynamic-overwrite blind spot)
    assert(!new java.io.File(s"$path/yr=2025").exists())
    assert(fileSig(path, "yr=2023") == sig2023)
  }

  test("two-level partitioning: upsert and delete touch only the named leaf dirs") {
    val path = tmp("graft-merge-2lvl")
    val base2 = Seq(
      (1L, 2023, 1, "a"), (2L, 2023, 2, "b"),
      (3L, 2024, 1, "c"), (4L, 2024, 1, "d"), (5L, 2024, 2, "e")
    ).toDF("id", "yr", "mo", "v")
    graft.sources.Sinks.parquetPartitioned(base2, path, Seq("yr", "mo"))
    val sig23_1 = fileSig(path, "yr=2023/mo=1")

    // upsert into (2024, 1): replace id=3, insert id=99
    val batch = Seq((3L, 2024, 1, "C!"), (99L, 2024, 1, "new"))
      .toDF("id", "yr", "mo", "v")
    val st = Merge.upsert(spark, path, batch, Seq("id"), Seq("yr", "mo"))
    assert(st.partitionsTouched == 1 && st.rowsWritten == 3)
    assert(fileSig(path, "yr=2023/mo=1") == sig23_1)
    val got = spark.read.parquet(path).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "C!", 4L -> "d",
      5L -> "e", 99L -> "new"))

    // delete everything in (2023, 2): the LEAF dir goes, yr=2023 stays
    val keys = Seq((2L, 2023, 2)).toDF("id", "yr", "mo")
    Merge.delete(spark, path, keys, Seq("id"), Seq("yr", "mo"))
    assert(!new java.io.File(s"$path/yr=2023/mo=2").exists())
    assert(new java.io.File(s"$path/yr=2023/mo=1").exists())
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSet
      == Set(1L, 3L, 4L, 5L, 99L))
  }

  test("documented boundary: a key that MOVES partitions duplicates (partition cols must be stable)") {
    // The scaladoc contract, pinned so it can't silently change: the
    // touched-partition set comes from the BATCH's partition values, so a
    // key whose batch row moved to a different partition leaves its old
    // row alive in the untouched directory. Partition columns must be
    // stable row properties (event date, language) — never mutable
    // attributes.
    val path = tmp("graft-merge-move")
    graft.sources.Sinks.parquetPartitioned(base(), path, Seq("yr"))
    val moved = Seq((1L, "a!", 2024, 99.0)).toDF("id", "v", "yr", "amt") // was yr=2023
    Merge.upsert(spark, path, moved, Seq("id"), Seq("yr"))
    val ids = spark.read.parquet(path).filter(col("id") === 1L)
      .select("yr").as[Int].collect().sorted
    assert(ids.toSeq == Seq(2023, 2024), "moving key should duplicate (documented)")
  }

  test("empty change batch is a no-op") {
    val path = tmp("graft-merge-empty")
    graft.sources.Sinks.parquetPartitioned(base(), path, Seq("yr"))
    val sig = Seq("yr=2023", "yr=2024", "yr=2025").map(fileSig(path, _))
    val empty = Seq.empty[(Long, String, Int, Double)].toDF("id", "v", "yr", "amt")
    val st1 = Merge.upsert(spark, path, empty, Seq("id"), Seq("yr"))
    val st2 = Merge.delete(spark, path, empty.select("id", "yr"), Seq("id"), Seq("yr"))
    assert(st1.rowsWritten == 0 && st2.rowsWritten == 0)
    assert(Seq("yr=2023", "yr=2024", "yr=2025").map(fileSig(path, _)) == sig)
  }
}
