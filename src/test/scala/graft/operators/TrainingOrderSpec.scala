package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.range(1000).select(col("id").as("doc_id"))

  test("(shard, pos) is a permutation: every doc once, ranks contiguous per shard") {
    val out = Curation.trainingOrder(docs, nShards = 8).cache()
    assert(out.count() == 1000)
    assert(out.select("doc_id").distinct().count() == 1000)
    // per shard: pos is exactly 1..n
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("replay-deterministic: two runs agree bit-for-bit, and shard-major order is global key order") {
    val a = Curation.trainingOrder(docs, nShards = 4)
      .orderBy("shard", "pos").collect().toSeq
    val b = Curation.trainingOrder(docs.repartition(7), nShards = 4)
      .orderBy("shard", "pos").collect().toSeq
    assert(a == b)
    // concatenating shards in shard order must equal the global
    // (sort_key, doc_id) order — the property that lets trainer workers
    // read shards sequentially without a merge
    val keys = a.map(r => (r.getLong(r.fieldIndex("sort_key")),
      r.getLong(r.fieldIndex("doc_id"))))
    assert(keys == keys.sorted)
  }

  test("a different salt is a different permutation over the same docs") {
    val a = Curation.trainingOrder(docs, nShards = 4, salt = "e1")
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val b = Curation.trainingOrder(docs, nShards = 4, salt = "e2")
      .orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    assert(a.toSet == b.toSet)
    assert(a != b)
  }

  test("shard fill is hash-uniform (no shard is empty or dominant at 1000 docs)") {
    val counts = Curation.trainingOrder(docs, nShards = 8)
      .groupBy("shard").count().select("count").as[Long].collect()
    assert(counts.length == 8)
    assert(counts.min > 50 && counts.max < 250, counts.toSeq.toString)
  }
}
