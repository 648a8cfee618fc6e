package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val probe = (0L until 10000L).map(i => (i, s"row$i")).toDF("k", "payload")
  private val build = (0L until 10000L by 100).map(i => ("b", i)).toDF("tag", "bk")

  test("bloomPrune result is a superset of the exact semi-join and prunes hard") {
    val pruned = RuntimeFilter.bloomPrune(probe, "k", build, "bk",
      expectedItems = 1000L, fpp = 0.01)
    val prunedKeys = pruned.select("k").as[Long].collect().toSet
    val exactKeys = (0L until 10000L by 100).toSet
    assert(exactKeys.subsetOf(prunedKeys), "bloom dropped a real key (false negative)")
    // 100 real keys of 10000 probe rows; 1% FP budget → pass-through must
    // stay near the build cardinality, nowhere near the raw probe count
    assert(prunedKeys.size < 400,
      s"bloom pruned almost nothing: ${prunedKeys.size} of 10000 passed")
    assert(pruned.columns.toSeq == probe.columns.toSeq, "schema must be preserved")
  }

  test("bloomPrune keeps the predicate on the probe side (no join/exchange added)") {
    val pruned = RuntimeFilter.bloomPrune(probe, "k", build, "bk")
    val plan = pruned.queryExecution.executedPlan.toString
    // The bloom rides a scalar subquery inside a Filter. The subquery's own
    // SinglePartition exchange (a one-row bloom aggregate) is expected; the
    // PROBE spine — every plan line outside the ':'-prefixed subquery
    // block — must stay join-free and exchange-free: predicate on the scan.
    val spine = plan.linesIterator.filterNot(_.contains(": ")).mkString("\n")
    assert(spine.contains("Filter might_contain"), plan)
    assert(!spine.contains("Join"), s"unexpected join in probe spine:\n$plan")
    assert(!spine.contains("Exchange"), s"unexpected exchange in probe spine:\n$plan")
  }

  test("the bloom surface is SQL-reachable via graft_bloom_agg / graft_might_contain") {
    probe.createOrReplaceTempView("rf_probe")
    build.createOrReplaceTempView("rf_build")
    val kept = spark.sql("""
      SELECT k FROM rf_probe
      WHERE graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(bk), 100L, 2000L) FROM rf_build),
        xxhash64(k))""").as[Long].collect().toSet
    assert((0L until 10000L by 100).toSet.subsetOf(kept))
    assert(kept.size < 10000, "an undersized bloom still prunes something")
  }

  test("graft_bloom_agg derives bits at 1% FP in the 2-arg form and rejects bad arity") {
    probe.createOrReplaceTempView("rf_probe")
    build.createOrReplaceTempView("rf_build")
    // 2-arg form: bits derived via optimalNumBits(items, 0.01) — must prune
    // to near the build cardinality, same bar as the explicit-bits test
    val kept = spark.sql("""
      SELECT k FROM rf_probe
      WHERE graft_might_contain(
        (SELECT graft_bloom_agg(xxhash64(bk), 100L) FROM rf_build),
        xxhash64(k))""").as[Long].collect().toSet
    assert((0L until 10000L by 100).toSet.subsetOf(kept))
    assert(kept.size < 400, s"auto-sized bloom under-pruned: ${kept.size} of 10000")
    // arity errors must be loud and named, not IndexOutOfBoundsException
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_bloom_agg(xxhash64(bk)) FROM rf_build").collect()
    }
    assert(e1.getMessage.contains("graft_bloom_agg"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT k FROM rf_probe WHERE graft_might_contain(CAST(NULL AS BINARY))")
        .collect()
    }
    assert(e2.getMessage.contains("graft_might_contain"), e2.getMessage)
  }

  test("bloomPrune refuses a build side past the session's bloom clamps") {
    // BloomFilterAggregate silently Math.min's items/bits against the
    // session maxima — bloomPrune must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrune(probe, "k", build, "bk",
        expectedItems = 5000000L) // past the 4M default clamp
    }
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("an empty build side prunes everything (no false negatives vacuously)") {
    val pruned = RuntimeFilter.bloomPrune(
      probe, "k", build.filter(col("bk") < 0), "bk", expectedItems = 10L)
    assert(pruned.count() == 0)
  }
}
