package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemperatureSampleSpec extends SparkSpec {
  import spark.implicits._

  // sources with 100 / 400 / 2500 docs: sqrt flattening keeps
  // ~100 / ~200 / ~500 — damped, not flattened
  private val docs = spark.range(3000).select(
    col("id").as("doc_id"),
    when(col("id") < 100, "small")
      .when(col("id") < 500, "mid").otherwise("big").as("source"))

  test("thresholds are the exact integer formula; the rarest source keeps everything") {
    val th = Curation.temperatureSample(docs)
      .groupBy("source").agg(max("th").as("th"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expect(cnt: Long): Long =
      math.floor(math.sqrt((100L * 1000000L) / cnt)).toLong
    assert(th == Map("small" -> expect(100), "mid" -> expect(400),
      "big" -> expect(2500)))
    assert(th("small") == 1000L) // α=1/2 at the min source = keep all
  }

  test("kept counts track sqrt(min*cnt): damped between uniform and raw") {
    val kept = Curation.temperatureSample(docs)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100L)
    // targets 200 and 500 with binomial noise (hash-uniform buckets)
    assert(kept("mid") > 140 && kept("mid") < 260, kept.toString)
    assert(kept("big") > 400 && kept("big") < 600, kept.toString)
    // strictly between the α=0 (uniform: 100) and α=1 (raw) endpoints
    assert(kept("big") > 100 && kept("big") < 2500)
  }

  test("deterministic: repartitioned input keeps the identical doc set") {
    val a = Curation.temperatureSample(docs)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.temperatureSample(docs.repartition(11))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}
