package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pruning — the semi-join-pushdown technique Spark's
  * own `InjectRuntimeFilter` rule plants between shuffle stages, exposed as
  * an explicit operator for the cases the optimizer can't see: the build
  * side came out of an opaque pipeline stage, the probe scan happens in a
  * different job or an earlier pass, or the filter should persist across
  * several queries (build once, prune many).
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * into a join and shuffling only the fraction that can match: the bloom
  * (~1.2 MB per 10⁶ keys at 1% FP) broadcasts to every probe task and rows
  * drop AT THE SCAN, before the exchange. False positives only cost wasted
  * shuffle rows — never wrong results (the downstream join still decides
  * membership exactly); false negatives are impossible by construction,
  * which is what makes the pruned scan safe to substitute for the raw one.
  *
  * Wraps Spark's internal `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the very expressions `InjectRuntimeFilter` uses), bridged into the
  * Column DSL; keys are hashed with xxhash64 on BOTH sides, matching the
  * rule's own convention.
  */
object RuntimeFilter {

  /** Aggregate Column: a bloom filter (BINARY) over `xxhash64(key)`. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Predicate Column: might the bloom contain `xxhash64(key)`? Never false
    * for a key that was inserted. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(
      BloomFilterMightContain(
        GraftBridge.expression(bloom),
        GraftBridge.expression(xxhash64(key))))

  /** Prune `probe` to rows whose `probeKey` might be in `build`'s
    * `buildKey` set: one tiny aggregate builds the bloom, shipped as a
    * scalar subquery (might_contain REQUIRES a constant or scalar-subquery
    * bloom side — the same planting InjectRuntimeFilter does), so the
    * predicate sits directly on the probe scan with no join in the way.
    * The result is a guaranteed superset of the exact semi-join — compose
    * with the real join downstream for exact semantics at a fraction of
    * the shuffle. */
  def bloomPrune(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01
  ): DataFrame = {
    // expectedItems <= 0 → size from the ACTUAL build cardinality (one
    // count job on the small side — what InjectRuntimeFilter reads from
    // stats). A fixed guess that the data outgrows silently overloads the
    // filter and blows the false-positive budget: measured 4x the FP bound
    // at 10x the tuning scale before this was made the default.
    val items = if (expectedItems > 0) expectedItems
      else math.max(1L, build.select(buildKey).count())
    val bits = optimalNumBits(items, fpp)
    // BloomFilterAggregate CLAMPS its arguments to the session maxima
    // (Math.min against these confs) — past the clamp the realized FP rate
    // silently explodes, the exact failure auto-sizing exists to prevent.
    // Fail loudly instead and point at the conf to raise.
    val conf = probe.sparkSession.conf
    val maxItems = conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      .map(_.toLong).getOrElse(4000000L)
    val maxBits = conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    require(items <= maxItems && bits <= maxBits,
      s"bloomPrune: build cardinality $items needs $bits bloom bits, but the " +
        s"session clamps at maxNumItems=$maxItems / maxNumBits=$maxBits — " +
        "raise spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits} " +
        "(the aggregate would silently clamp and blow the FP budget)")
    val bloomPlan = GraftBridge.logicalPlan(build.agg(
      bloomAgg(col(buildKey), items, bits).as("__bf")))
    val pred = BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bloomPlan),
      GraftBridge.expression(xxhash64(col(probeKey))))
    probe.filter(GraftBridge.column(pred))
  }

  /** Standard bloom sizing: bits = -n·ln(p)/ln(2)² (what Spark's
    * BloomFilter.optimalNumOfBits computes), floored at 64. */
  def optimalNumBits(n: Long, p: Double): Long =
    math.max(64L, (-n * math.log(p) / (math.log(2) * math.log(2))).toLong)
}
