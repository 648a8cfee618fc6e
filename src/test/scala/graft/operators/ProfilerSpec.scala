package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private val frame = Seq(
    (Some(1), Some("a"), Some(1.5)),
    (Some(2), Some("b"), None),
    (Some(2), None, Some(2.5)),
    (None, Some("a"), Some(2.5))
  ).toDF("i", "s", "d")

  test("exact profile: counts, distincts, min/max per column in one pass") {
    val rows = Profiler.profile(frame, Seq("i", "s", "d"), exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("i", "s", "d"))
    val i = rows("i")
    assert(i.getLong(1) == 4 && i.getLong(2) == 3 && i.getLong(3) == 1) // rows/nonnull/null
    assert(i.getLong(4) == 2 && i.getLong(5) == 2)                     // nd / approx
    assert(i.getString(6) == "1" && i.getString(7) == "2")             // min/max as strings
    val s = rows("s")
    assert(s.getLong(2) == 3 && s.getLong(4) == 2)
    assert(s.isNullAt(8) && s.isNullAt(9), "non-numeric column must have NULL quantiles")
    val d = rows("d")
    assert(d.getString(6) == "1.5" && d.getString(7) == "2.5")
  }

  test("approx-only default is the Expand-free 100 TB plan; exact pays Expand") {
    val big = spark.range(1000).select(col("id"), (col("id") % 7).as("m"))
    val approxPlan = Profiler.profile(big, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      "approx profile must stay a single-branch aggregate")
    val exactPlan = Profiler.profile(big, Seq("id", "m"), exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact profile should show the known countDistinct Expand cost")
    // approx mode leaves n_distinct NULL — the reader can't mistake an
    // estimate for the exact cardinality
    assert(Profiler.profile(big, Seq("id")).collect().forall(_.isNullAt(4)))
  }

  test("sketched quantiles respect the GK rank bound on a uniform column") {
    val uni = spark.range(10000).select(col("id").cast("double").as("v"))
    val r = Profiler.profile(uni, Seq("v"), quantileEps = 0.01).collect().head
    val (p50, p95) = (r.getDouble(8), r.getDouble(9))
    // eps=0.01 rank error on uniform 0..9999 → value within ~±100+ of the
    // true quantile; assert a loose 5x band (merge order moves estimates)
    assert(math.abs(p50 - 5000) <= 500, s"p50=$p50")
    assert(math.abs(p95 - 9500) <= 500, s"p95=$p95")
  }

  test("zero-row input profiles as zero counts with NULL min/max/quantiles") {
    val rows = Profiler.profile(frame.limit(0), Seq("i", "s"), exact = true).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
      assert(r.getLong(4) == 0)       // exact countDistinct of nothing is 0
      assert(r.isNullAt(6) && r.isNullAt(7))
    }
  }

  test("unknown columns fail loud") {
    val ex = intercept[IllegalArgumentException] {
      Profiler.profile(frame, Seq("i", "nope"))
    }
    assert(ex.getMessage.contains("nope"))
  }

  test("joinProfile: exact cardinality, unmatched sides, NULL keys never match") {
    val l = Seq(Some("a"), Some("a"), Some("b"), Some("c"), None).toDF("k1")
    val r = Seq(Some("a"), Some("b"), Some("b"), Some("d"), None).toDF("k2")
    val p = Profiler.joinProfile(l, "k1", r, "k2").head()
    // matched a (2*1) + b (1*2) = 4; c and the left NULL group unmatched;
    // d and the right NULL group unmatched
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)) ==
      (4L, 2L, 2L, 2L))
    assert(p.getLong(4) == 2L)
    // empty sides: zero counts, NULL max, no crash
    val e = Profiler.joinProfile(l.limit(0), "k1", r.limit(0), "k2").head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(4))
  }

  test("joinHotKeys: contribution order with ties to the smallest key, heap-pruned plan") {
    val l = Seq("a", "a", "b", "x").toDF("k1")
    val r = Seq("a", "b", "b").toDF("k2")
    val hot = Profiler.joinHotKeys(l, "k1", r, "k2", 2)
    val rows = hot.select("k", "contribution").as[(String, Long)].collect().toSeq
    // a and b both contribute 2 -> tie breaks to 'a'
    assert(rows == Seq(("a", 2L), ("b", 2L)))
    val plan = hot.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must heap-prune, not globally sort:\n$plan")
  }

  test("spearman: exact poles, tie-averaged ranks, constant-signal NULL, repartition-invariant") {
    import spark.implicits._
    def one(rows: Seq[(Long, Long)]) =
      Profiler.spearman(rows.toDF("a", "b"), "a", "b").head()
    // perfect monotone agreement / inversion hit the exact poles
    val up = one(Seq((1L, 10L), (2L, 20L), (3L, 40L), (4L, 80L)))
    assert(up.getAs[Int]("sign") == 1 && up.getAs[Long]("rho2_ppm") == 1000000L)
    val down = one(Seq((1L, 80L), (2L, 40L), (3L, 20L), (4L, 10L)))
    assert(down.getAs[Int]("sign") == -1
      && down.getAs[Long]("rho2_ppm") == 1000000L)
    // hand-computed tie case: a = 1,2,2,3 vs b = 10,20,30,40 —
    // centered 2x ranks a' = -3,0,0,3, b' = -3,-1,1,3 →
    // ρ²_ppm = 18²·1e6 / (18·20) = 900000
    val tied = one(Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L)))
    assert(tied.getAs[Int]("sign") == 1
      && tied.getAs[Long]("rho2_ppm") == 900000L)
    // a constant signal has zero rank variance: NULL, never a fake 0
    val const = one(Seq((7L, 1L), (7L, 2L), (7L, 3L)))
    assert(const.isNullAt(const.fieldIndex("rho2_ppm")))
    // resample-fate independence of layout
    val big = (1L to 500L).map(i => (i % 23, (i * 7) % 41))
    val base = Profiler.spearman(big.toDF("a", "b"), "a", "b").head()
    val rep = Profiler.spearman(big.toDF("a", "b").repartition(13), "a", "b").head()
    assert(base == rep)
  }
}
