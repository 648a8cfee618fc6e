package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval×interval (overlap) join — both sides carry a [start, end)
  * interval and a pair matches when the intervals intersect:
  * `l.start < r.end && r.start < l.end`.
  *
  * Distinct from the point-in-interval lookup ([[AsOfJoin.rangeJoin]] /
  * `plans.RangeJoinPlan`), where one side is a scalar and the interval side
  * must be broadcast-small. Here BOTH sides can be large (billions of
  * sessions × billions of incident windows), so neither broadcast-nested-loop
  * nor a per-key cross-filter survives 100 TB.
  *
  * Reference semantics: SmartPipeline joins enrichment batches by exact key
  * only (smartpipeline/stages.py:205 `BatchStage`); overlap matching is part
  * of this engine's extended temporal surface, alongside the as-of join.
  *
  * == Plan shape ==
  *
  * Spark plans `l.key = r.key AND l.s < r.e AND r.s < l.e` as a sort-merge
  * join on `key` alone with the range residual as a post-join filter: every
  * same-key pair is MATERIALIZED then filtered, O(n_k · m_k) per key, and a
  * hot key — one tenant with 10⁸ sessions — is quadratic inside one task.
  *
  * This operator decomposes time into fixed-width buckets instead (the
  * standard "grid partitioning" interval join, cf. Flink's interval-join
  * bucketed state and the overlap-interval-partitioning literature):
  *
  *  1. each interval explodes to the bucket ids it covers
  *     (`floorDiv(s, W) .. floorDiv(e-1, W)` — half-open, so `e` itself is
  *     not covered);
  *  2. equi-join on `(keys…, bucket)` — a plain shuffled hash/SMJ join whose
  *     per-task work is bounded by per-(key, bucket) DENSITY, not per-key
  *     cardinality, and whose skew AQE can split;
  *  3. the overlap predicate filters inside the join condition;
  *  4. exactly-once emission WITHOUT a distinct pass: a matching pair is
  *     kept only in the bucket containing `max(l.s, r.s)`. That instant lies
  *     in both intervals (it is the start of their intersection), so both
  *     sides replicated into that bucket, and it names exactly one bucket —
  *     no dedup shuffle after the join.
  *
  * Cost lever: an interval spanning `n` buckets replicates `n` times, so
  * `bucketWidth` should be on the order of a typical interval length —
  * replication stays O(1) per row while bucket density stays fine-grained
  * enough to split hot regions. Degenerate long-lived intervals (a session
  * that never ends) belong on a capped-length encoding upstream.
  *
  * Coordinates are integral (epoch micros, positions, …); intervals are
  * half-open `[start, end)` and rows with `end <= start` match nothing and
  * are dropped.
  */
object IntervalJoin {

  /** Exact floor division for possibly-negative longs. `c - pmod(c, w)` is
    * the greatest multiple of `w` at or below `c`; SQL `div` is integral
    * long division (Column./ would go through DOUBLE). */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** All bucket ids covered by half-open [s, e). */
  private def bucketsOf(s: Column, e: Column, w: Long): Column =
    sequence(floorDiv(s, w), floorDiv(e - 1, w))

  /** Overlap-join `left` and `right` on equal `keys` plus interval
    * intersection of `[leftStart, leftEnd)` × `[rightStart, rightEnd)`.
    *
    * `mode` selects the Allen-style relation (all share the same grid plan;
    * only the predicate differs, because in every mode the intersection
    * start `max(l.s, r.s)` lies inside both intervals, so the exactly-once
    * claim rule is mode-independent):
    *  - `"overlaps"` — intervals intersect: `l.s < r.e && r.s < l.e`;
    *  - `"contains"` — left contains right: `l.s <= r.s && r.e <= l.e`;
    *  - `"during"`   — left inside right:   `r.s <= l.s && l.e <= r.e`.
    *
    * Interval columns must be integral (LongType-castable). Non-key output
    * column names must be disjoint between the two sides (keys appear once,
    * from the left). Returns keys ++ left payload ++ right payload, one row
    * per matching pair. Safe when both inputs derive from the same source
    * (self-overlap): the right side is internally re-aliased so attribute
    * resolution never sees a same-lineage ambiguity.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
      mode: String = "overlaps"
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(Set("overlaps", "contains", "during")(mode),
      s"mode must be overlaps/contains/during, got '$mode'")
    // interval columns included: same-named start/end on both sides would
    // silently emit duplicate output column names and break any downstream
    // reference with AMBIGUOUS_REFERENCE
    val overlapNonKey =
      left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlapNonKey.isEmpty,
      s"non-key columns ${overlapNonKey.mkString(", ")} appear on both " +
        "sides — rename before joining")
    val reserved = (left.columns ++ right.columns)
      .filter(c => c == "__bk" || c.startsWith("__r_"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with the operator's " +
        "internal __bk/__r_ namespace")

    val l = left
      .filter(col(leftEnd) > col(leftStart))
      .withColumn("__bk",
        explode(bucketsOf(col(leftStart).cast("long"),
          col(leftEnd).cast("long"), bucketWidth)))
    val r0 = right
      .filter(col(rightEnd) > col(rightStart))
      .withColumn("__bk",
        explode(bucketsOf(col(rightStart).cast("long"),
          col(rightEnd).cast("long"), bucketWidth)))
    // fresh names on the whole right side → no same-lineage ambiguity
    val r = r0.select(r0.columns.map(c => col(c).as(s"__r_$c")).toIndexedSeq: _*)
    def rc(c: String): Column = r(s"__r_$c")

    val rel = mode match {
      case "overlaps" => l(leftStart) < rc(rightEnd) && rc(rightStart) < l(leftEnd)
      case "contains" => l(leftStart) <= rc(rightStart) && rc(rightEnd) <= l(leftEnd)
      case "during"   => rc(rightStart) <= l(leftStart) && l(leftEnd) <= rc(rightEnd)
    }
    val cond = keys.map(k => l(k) === rc(k))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      l("__bk") === rc("__bk") && rel &&
      // claim: only the bucket holding the intersection start emits the pair
      floorDiv(greatest(l(leftStart).cast("long"),
        rc(rightStart).cast("long")), bucketWidth) === l("__bk")

    val keyCols = keys.map(k => l(k).as(k))
    val lPayload = left.columns.filterNot(keys.contains).map(c => l(c).as(c))
    val rPayload = right.columns.filterNot(keys.contains).map(c => rc(c).as(c))
    l.join(r, cond)
      .select((keyCols ++ lPayload ++ rPayload).toIndexedSeq: _*)
  }

  /** [[overlapJoin]] with the bucket width derived from the data instead of
    * hand-pinned — the same composed-auto contract as the ANN auto-k/nProbe
    * modes: ANY width is correct (parity is width-independent), the width
    * only trades per-row replication against per-bucket density. The rule
    * `W = max(mean interval length of each side)` keeps the mean row's
    * replication at ≤ ~2 buckets on both sides while buckets stay as
    * fine-grained as the data allows. Costs one tiny two-column aggregate
    * per side up front (same eager-fit precedent as `ivfTopK` auto-k).
    *
    * `widthSampleFraction < 1` estimates each mean on a seeded
    * `sample(f)` instead of the full side — at 100 TB the exact means
    * would cost two extra FULL scans before the join, and since ANY width
    * is correct, a 1 % sample buys the same order-of-magnitude width for
    * 1 % of the scan (parity is width-independent — spec-asserted). A
    * side whose sample comes up empty falls back to its exact mean, so
    * small inputs keep the exact path automatically.
    * Empty/degenerate sides fall back to width 1. */
  def overlapJoinAuto(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      mode: String = "overlaps",
      widthSampleFraction: Double = 1.0
  ): DataFrame = {
    require(widthSampleFraction > 0 && widthSampleFraction <= 1.0,
      s"widthSampleFraction must be in (0, 1], got $widthSampleFraction")
    def meanLen(df: DataFrame, s: String, e: String): Option[Long] =
      Option(df.filter(col(e) > col(s))
        .agg(avg(col(e).cast("long") - col(s).cast("long"))).head().get(0))
        .map(v => math.ceil(v.asInstanceOf[Double]).toLong)
    def sideWidth(df: DataFrame, s: String, e: String): Long = {
      val sampled =
        if (widthSampleFraction < 1.0)
          // seeded → the width (hence the plan) is replay-deterministic
          meanLen(df.sample(withReplacement = false, widthSampleFraction, seed = 7L), s, e)
        else None
      sampled.orElse(meanLen(df, s, e)).getOrElse(1L)
    }
    val w = math.max(1L, math.max(
      sideWidth(left, leftStart, leftEnd), sideWidth(right, rightStart, rightEnd)))
    overlapJoin(left, right, keys,
      leftStart, leftEnd, rightStart, rightEnd, w, mode)
  }
}
