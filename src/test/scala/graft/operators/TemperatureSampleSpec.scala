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

  test("budgetAllocate: Hamilton apportionment hand-check with remainder ties") {
    // equal sources -> equal weights; budget 7 over 3 sources:
    // s = 2 each, extra 1 goes to the lexicographically smallest
    val eq = spark.range(30).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("source"))
    val take = Curation.budgetAllocate(eq, budget = 7L)
      .groupBy("source").agg(max("take_n").as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(take == Map("s0" -> (3L, 3L), "s1" -> (2L, 2L), "s2" -> (2L, 2L)))
  }

  test("budgetAllocate: exact budget when uncapped; caps at source size and under-fills") {
    // weights 10000/20000/50000 (sqrt of 1e8/4e8/2.5e9); budget 640
    // divides exactly: 80 + 160 + 400, no remainders, no caps
    val out = Curation.budgetAllocate(docs, budget = 640L) // 3000 docs
    assert(out.count() == 640L)
    val per = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weighting: "small" gets 12.5% of the budget vs its 3.3% raw share
    assert(per == Map("small" -> 80L, "mid" -> 160L, "big" -> 400L))
    // budget whose proportional seats exceed the small source's size:
    // capped at 100, total under-fills (the stated contract)
    val capped = Curation.budgetAllocate(docs, budget = 900L)
    val perC = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perC("small") == 100L) // seats 112 > its 100 docs -> capped
    assert(perC("mid") == 225L && perC("big") == 563L)
    assert(capped.count() == 888L) // 900 under-fills by the capped 12
  }

  test("budgetAllocate: deterministic under repartition") {
    val a = Curation.budgetAllocate(docs, budget = 500L)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.budgetAllocate(docs.repartition(13), budget = 500L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("budgetAllocateExact: water-fill closes the under-fill exactly") {
    // budget 900 caps "small" at 100 in the one-pass form (fills 888);
    // the water-fill re-apportions the 12-doc shortfall over mid/big
    val out = Curation.budgetAllocateExact(docs, budget = 900L)
    assert(out.count() == 900L)
    val per = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per("small") == 100L)
    assert(per("mid") + per("big") == 800L)
    // equals the one-pass allocation whenever nothing caps
    val a = Curation.budgetAllocate(docs, budget = 640L)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.budgetAllocateExact(docs, budget = 640L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // budget beyond the corpus: everything, no more
    assert(Curation.budgetAllocateExact(docs, budget = 5000L).count() == 3000L)
    // deterministic under repartition
    val r1 = Curation.budgetAllocateExact(docs, 900L)
      .select("doc_id").as[Long].collect().toSet
    val r2 = Curation.budgetAllocateExact(docs.repartition(13), 900L)
      .select("doc_id").as[Long].collect().toSet
    assert(r1 == r2)
  }
}
