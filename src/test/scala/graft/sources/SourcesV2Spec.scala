package graft.sources

import graft.SparkSpec
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SourcesV2Spec extends SparkSpec {

  private def docs(rows: Int, parts: Int) =
    spark.read.format("graft.sources.v2.SyntheticDocs")
      .option("rows", rows.toString)
      .option("partitions", parts.toString)
      .option("seed", "42").load()

  test("DataSourceV2 synthetic source: schema, row count, partitioning") {
    val df = docs(1000, 4)
    assert(df.schema.fieldNames.toSeq == Seq("id", "text"))
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select(countDistinct(col("id"))).head().getLong(0) == 1000)
  }

  test("DataSourceV2 source is deterministic (task-retry safe)") {
    val a = docs(200, 3).collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = docs(200, 3).collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("DataSourceV2 source composes with the relational surface") {
    val out = docs(500, 2)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
    assert(out.count() == 16) // full vocab appears
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join results") {
    val left = (1 to 1000).map(i => (i.toLong % 3, i.toLong)).toDF("k", "v") // 3 hot keys
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("rk", "name")
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", salts = 4)
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = left.join(right, $"k" === $"rk")
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
