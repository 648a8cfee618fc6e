package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random intervals, including negative coordinates
    * and spans much longer than the bucket width. */
  private def mkIntervals(n: Int, salt: Int, kMod: Int): DataFrame =
    spark.range(n).select(
      (col("id") % kMod).as("k"),
      col("id").as(s"id$salt"),
      ((col("id") * 2654435761L + salt * 40503L) % 2000L - 500L).as("s"))
      .withColumn("e", col("s") + pmod(col(s"id$salt") * 97L + salt, lit(300L)) - 20L)

  test("overlapJoin equals the naive predicate join, exactly once per pair") {
    val left = mkIntervals(400, 1, 7)
    val right = mkIntervals(300, 2, 7)
      .withColumnRenamed("s", "s2").withColumnRenamed("e", "e2")
    for (w <- Seq(10L, 100L, 5000L)) {
      val got = IntervalJoin.overlapJoin(left, right, Seq("k"),
          "s", "e", "s2", "e2", w)
        .select(col("id1"), col("id2")).as[(Long, Long)].collect().sorted
      val want = left.filter(col("e") > col("s")).as("l")
        .join(right.filter(col("e2") > col("s2")).as("r"), Seq("k"))
        .where(col("s") < col("e2") && col("s2") < col("e"))
        .select(col("id1"), col("id2")).as[(Long, Long)].collect().sorted
      assert(want.nonEmpty, "test data produced no overlaps — fixture bug")
      assert(got.toSeq == want.toSeq, s"mismatch at bucketWidth=$w")
    }
  }

  test("overlapJoinAuto parity is width-independent: sampled width == exact width == pinned") {
    // ANY bucket width yields the same pair set (only replication/density
    // shift), so the 1%-sample width estimate can never change the answer
    // — the property that makes sampling free at 100 TB.
    val left = mkIntervals(400, 1, 7)
    val right = mkIntervals(300, 2, 7)
      .withColumnRenamed("s", "s2").withColumnRenamed("e", "e2")
    def pairs(df: DataFrame): Seq[(Long, Long)] =
      df.select(col("id1"), col("id2")).as[(Long, Long)].collect().sorted.toSeq
    val exact = pairs(IntervalJoin.overlapJoinAuto(
      left, right, Seq("k"), "s", "e", "s2", "e2"))
    val sampled = pairs(IntervalJoin.overlapJoinAuto(
      left, right, Seq("k"), "s", "e", "s2", "e2",
      widthSampleFraction = 0.05))
    val pinned = pairs(IntervalJoin.overlapJoin(
      left, right, Seq("k"), "s", "e", "s2", "e2", 123L))
    assert(exact.nonEmpty)
    assert(sampled == exact && pinned == exact)
    // a sample that comes up empty falls back to the exact mean: tiny
    // input + minuscule fraction still produces the right answer
    val tinyL = left.limit(5)
    val tinyPairs = pairs(IntervalJoin.overlapJoinAuto(
      tinyL, right, Seq("k"), "s", "e", "s2", "e2",
      widthSampleFraction = 1e-6))
    val tinyWant = pairs(IntervalJoin.overlapJoin(
      tinyL, right, Seq("k"), "s", "e", "s2", "e2", 50L))
    assert(tinyPairs == tinyWant)
  }

  // mkIntervals(right) must share lineage with left for this to bite:
  // the operator re-aliases the right side internally, so a self-overlap
  // join (pairs within one table) resolves without ambiguity errors.
  test("self-overlap join on the same DataFrame resolves and dedups") {
    val iv = mkIntervals(200, 3, 5)
    val got = IntervalJoin.overlapJoin(
        iv.select(col("k"), col("id3").as("a"), col("s"), col("e")),
        iv.select(col("k"), col("id3").as("b"), col("s").as("s2"), col("e").as("e2")),
        Seq("k"), "s", "e", "s2", "e2", 50L)
      .where(col("a") < col("b"))
    val n = got.count()
    val dedup = got.select("a", "b").distinct().count()
    assert(n == dedup, "pair emitted from more than one bucket")
    assert(n > 0)
  }

  test("touching endpoints do not match (half-open), empty intervals dropped") {
    val l = Seq((1L, 10L, 20L), (1L, 30L, 30L)).toDF("k", "s", "e")
    val r = Seq((1L, 20L, 25L), (1L, 0L, 10L), (1L, 25L, 40L)).toDF("k", "s2", "e2")
    val got = IntervalJoin.overlapJoin(l, r, Seq("k"), "s", "e", "s2", "e2", 7L)
    // [10,20) touches [20,25) and [0,10) only at endpoints; [30,30) is empty
    assert(got.count() == 0)
  }

  test("bucket-claim keeps a many-bucket-spanning pair exactly once") {
    val l = Seq((1L, -95L, 905L)).toDF("k", "s", "e")   // spans ~100 buckets at w=10
    val r = Seq((1L, 400L, 402L), (1L, -200L, -95L)).toDF("k", "s2", "e2")
    val got = IntervalJoin.overlapJoin(l, r, Seq("k"), "s", "e", "s2", "e2", 10L)
    assert(got.count() == 1) // second interval only touches at -95
    assert(got.select("s2").as[Long].head() == 400L)
  }

  test("contains/during modes equal the naive predicate join") {
    val left = mkIntervals(300, 6, 4)
    val right = mkIntervals(300, 7, 4)
      .withColumnRenamed("s", "s2").withColumnRenamed("e", "e2")
    def naive(pred: org.apache.spark.sql.Column) =
      left.filter(col("e") > col("s"))
        .join(right.filter(col("e2") > col("s2")), Seq("k"))
        .where(pred).select(col("id6"), col("id7"))
        .as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(10L, 250L)) {
      val gotC = IntervalJoin.overlapJoin(left, right, Seq("k"),
          "s", "e", "s2", "e2", w, mode = "contains")
        .select(col("id6"), col("id7")).as[(Long, Long)].collect().sorted.toSeq
      assert(gotC == naive(col("s") <= col("s2") && col("e2") <= col("e")),
        s"contains mismatch at w=$w")
      val gotD = IntervalJoin.overlapJoin(left, right, Seq("k"),
          "s", "e", "s2", "e2", w, mode = "during")
        .select(col("id6"), col("id7")).as[(Long, Long)].collect().sorted.toSeq
      assert(gotD == naive(col("s2") <= col("s") && col("e") <= col("e2")),
        s"during mismatch at w=$w")
      assert(gotC.nonEmpty && gotD.nonEmpty, "fixture produced no matches")
    }
  }

  test("same-named interval columns on both sides are rejected, not duplicated") {
    val l = Seq((1L, 10L, 20L)).toDF("k", "start", "end")
    val r = Seq((1L, 15L, 25L)).toDF("k", "start", "end")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(l, r, Seq("k"), "start", "end", "start", "end", 10L)
    }
    assert(e.getMessage.contains("rename before joining"))
  }

  test("unkeyed join (keys empty) buckets on time alone") {
    val l = Seq((10L, 1L, 100L), (20L, 500L, 600L)).toDF("lid", "s", "e")
    val r = Seq((30L, 50L, 120L), (40L, 700L, 800L)).toDF("rid", "s2", "e2")
    val got = IntervalJoin.overlapJoin(l, r, Seq.empty,
        "s", "e", "s2", "e2", 64L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 30L)))
  }

  test("auto width equals any pinned width (parity is width-independent)") {
    val left = mkIntervals(300, 4, 5)
    val right = mkIntervals(250, 5, 5)
      .withColumnRenamed("s", "s2").withColumnRenamed("e", "e2")
    val auto = IntervalJoin.overlapJoinAuto(left, right, Seq("k"),
        "s", "e", "s2", "e2")
      .select(col("id4"), col("id5")).as[(Long, Long)].collect().sorted
    val pinned = IntervalJoin.overlapJoin(left, right, Seq("k"),
        "s", "e", "s2", "e2", 97L)
      .select(col("id4"), col("id5")).as[(Long, Long)].collect().sorted
    assert(auto.nonEmpty && auto.toSeq == pinned.toSeq)
    // degenerate side: all-empty intervals → width falls back, no throw
    val empty = left.filter(col("e") <= col("s"))
    assert(IntervalJoin.overlapJoinAuto(empty, right, Seq("k"),
      "s", "e", "s2", "e2").count() == 0)
  }

  test("plan is an equi-join on (key, bucket) — no nested-loop, no cartesian") {
    val left = mkIntervals(100, 1, 3)
    val right = mkIntervals(100, 2, 3)
      .withColumnRenamed("s", "s2").withColumnRenamed("e", "e2")
    val plan = IntervalJoin.overlapJoin(left, right, Seq("k"),
      "s", "e", "s2", "e2", 100L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
