package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("next-fit packs in id order with O(1) state semantics") {
    // single shard, ids in order, sizes 3,4,2,6,5 at budget 8:
    //   bin0 = {3,4} (rem 1), bin1 = {2,6} (rem 0), bin2 = {5}
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 6L), (5L, 5L))
      .toDF("id", "tok")
    val packed = Packing.nextFitPack(df, "id", "tok", budget = 8, nShards = 1)
      .orderBy("id").select("id", "bin").as[(Long, Long)].collect().toSeq
    assert(packed == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 2L)))
  }

  test("oversized documents get a flagged bin of their own and never corrupt a neighbor") {
    val df = Seq((1L, 10L), (2L, 2L), (3L, 3L)).toDF("id", "tok")
    val packed = Packing.nextFitPack(df, "id", "tok", budget = 8, nShards = 1)
      .orderBy("id").select("id", "bin", "oversize")
      .as[(Long, Long, Boolean)].collect().toSeq
    // 10 fills bin0 (oversize), 2 must OPEN bin1 (not inherit negative
    // remainder), 3 joins it
    assert(packed == Seq((1L, 0L, true), (2L, 1L, false), (3L, 1L, false)))
    val st = Packing.packingStats(
      Packing.nextFitPack(df, "id", "tok", 8, 1), 8).head()
    // padding counts only non-oversize bins: bin1 holds 5 of 8
    assert(st.getLong(1) == 2L && st.getLong(4) == 3L && st.getLong(5) == 1L)
  }

  test("no document ever splits and every bin respects the budget") {
    val df = spark.range(500).select(col("id"), (pmod(col("id") * 37, lit(90)) + 10).as("tok"))
    val packed = Packing.nextFitPack(df, "id", "tok", budget = 128, nShards = 4)
    assert(packed.count() == 500, "every document packed exactly once")
    val bad = Packing.packingStats(packed, 128)
      .filter(col("padding") < 0).count()
    assert(bad == 0)
    val overBudget = packed.filter(!col("oversize"))
      .groupBy("shard", "bin").agg(sum("size").as("fill"))
      .filter(col("fill") > 128).count()
    assert(overBudget == 0, "non-oversize bins never exceed the budget")
  }

  test("packing is a pure function of the data (partitioning independence)") {
    val df = spark.range(300).select(col("id"), (pmod(col("id") * 13, lit(60)) + 5).as("tok"))
    val a = Packing.nextFitPack(df, "id", "tok", 100, 4)
      .orderBy("id").collect().toSeq
    val b = Packing.nextFitPack(df.repartition(11), "id", "tok", 100, 4)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
