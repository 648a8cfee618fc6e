package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  test("smooth: hand-computed fixed-point recurrence, keys independent, input order irrelevant") {
    // key A series 100, 200, 0, 400 at α=0.25:
    //   e1 = 100
    //   e2 = (200·250000 + 100·750000) DIV 1e6 = 125
    //   e3 = (  0·250000 + 125·750000) DIV 1e6 = 93   (floor of 93.75)
    //   e4 = (400·250000 +  93·750000) DIV 1e6 = 169  (floor of 169.75)
    val series = Seq(
      ("A", 4, 400L), ("A", 1, 100L), ("A", 3, 0L), ("A", 2, 200L), // shuffled
      ("B", 1, 7L), ("B", 2, 7L)
    ).toDF("k", "t", "x")
    val out = Ewma.smooth(series, "k", "t", "x")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(out(("A", 1)) == 100L && out(("A", 2)) == 125L
      && out(("A", 3)) == 93L && out(("A", 4)) == 169L)
    // a constant series is its own EWMA at any α (fixed point, exactly)
    assert(out(("B", 1)) == 7L && out(("B", 2)) == 7L)
    // repartition-invariant: the fold runs per key after an exact sort
    val rep = Ewma.smooth(series.repartition(7), "k", "t", "x")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(rep == out)
    intercept[IllegalArgumentException] { Ewma.smooth(series, "k", "t", "x", 0L) }
    intercept[IllegalArgumentException] {
      Ewma.smooth(series, "k", "t", "x", 1000000L)
    }
  }

  test("theilSen: exact median slope, truncating negative division, singles excluded") {
    // slopes of (1,1)(2,3)(3,2)(4,10): 2e6, 5e5, 3e6, -1e6, 35e5, 8e6 →
    // sorted -1e6, 5e5, 2e6, 3e6, 3.5e6, 8e6; percentile_disc(0.5) over 6
    // values = the 3rd = 2e6
    val series = Seq(("A", 1, 1L), ("A", 2, 3L), ("A", 3, 2L), ("A", 4, 10L),
      ("S", 9, 5L)) // single point: no pairs, excluded
      .toDF("k", "t", "x")
    val out = Trend.theilSen(series, "k", "t", "x").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("A"))
    assert(out("A") == ((4L, 6L, 2000000L)))
    // a falling series: -7e6 over 3 steps = -2333333.33… and BOTH engines'
    // integral division truncates toward zero → -2333333, not the floor
    val neg = Seq(("B", 1, 7L), ("B", 4, 0L)).toDF("k", "t", "x")
    assert(Trend.theilSen(neg, "k", "t", "x").head().getAs[Long]("slope_ppm")
      == -2333333L)
  }

  test("poissonUpper: hand recurrence, alarm at the decision interval, reference-window params") {
    // med = 4 (percentile_disc over 4,4,4,9,9,9), isqrt = 2, k2 = 10,
    // h2 = 16; s2 walks 0,0,0,8,16,24 — only the last crosses
    val series = Seq(("A", 1, 4L), ("A", 2, 4L), ("A", 3, 4L),
      ("A", 4, 9L), ("A", 5, 9L), ("A", 6, 9L)).toDF("k", "t", "x")
    val out = Cusum.poissonUpper(series, "k", "t", "x", l = 4).collect()
      .map(r => r.getInt(1) -> ((r.getAs[Long]("cusum2"),
        r.getAs[Long]("h2"), r.getAs[Boolean]("alarm")))).toMap
    assert(out == Map(1 -> ((0L, 16L, false)), 2 -> ((0L, 16L, false)),
      3 -> ((0L, 16L, false)), 4 -> ((8L, 16L, false)),
      5 -> ((16L, 16L, false)), 6 -> ((24L, 16L, true))))
    // params fit on an in-control window: med over the first 3 cells is
    // the same 4 here, so verdicts agree; a key absent from the reference
    // has no baseline and is excluded
    val refWin = series.filter(col("t") <= 3)
    val withNew = series.union(Seq(("Z", 1, 50L), ("Z", 2, 50L)).toDF("k", "t", "x"))
    val ref = Cusum.poissonUpper(withNew, "k", "t", "x", l = 4,
      reference = Some(refWin)).collect()
    assert(ref.map(_.getString(0)).toSet == Set("A"))
    assert(ref.map(r => r.getInt(1) -> r.getAs[Long]("cusum2")).toMap
      == out.view.mapValues(_._1).toMap)
    intercept[IllegalArgumentException] {
      Cusum.poissonUpper(series, "k", "t", "x", l = 0)
    }
  }

  test("poissonUpper: zero-median sparse key does not alarm on its first nonzero cell") {
    // med = 0 → σ floored at 1 → k2 = 1, h2 = 8: a single 1 contributes
    // 2·1−1 = 1 to the doubled statistic — far under the interval; only
    // a sustained burst (here five 1s, s2 = 5·1... then a 3 pushing past
    // 8) alarms. Unfloored, k2 = h2 = 0 and the FIRST 1 would alarm.
    val sparse = Seq(("S", 1, 0L), ("S", 2, 0L), ("S", 3, 0L),
      ("S", 4, 1L), ("S", 5, 0L), ("S", 6, 1L)).toDF("k", "t", "x")
    val out = Cusum.poissonUpper(sparse, "k", "t", "x", l = 4).collect()
      .map(r => r.getInt(1) -> ((r.getAs[Long]("cusum2"), r.getAs[Boolean]("alarm"))))
      .toMap
    assert(out.values.forall(!_._2), s"sparse blips must not alarm: $out")
    assert(out(4) == ((1L, false)) && out(6) == ((1L, false)), s"got $out")
    // a genuine sustained burst on the same baseline still alarms
    val burst = Seq(("S", 1, 0L), ("S", 2, 0L), ("S", 3, 0L),
      ("S", 4, 0L), ("S", 5, 5L), ("S", 6, 5L)).toDF("k", "t", "x")
    val b = Cusum.poissonUpper(burst, "k", "t", "x", l = 4,
      reference = Some(burst.filter(col("t") <= 4))).collect()
      .map(r => r.getInt(1) -> r.getAs[Boolean]("alarm")).toMap
    assert(b(6), s"sustained shift must still alarm: $b")
  }

  test("smooth: alpha extremes bracket the behavior") {
    val series = (1 to 10).map(i => ("k", i, if (i == 10) 1000L else 0L))
      .toDF("k", "t", "x")
    // α near 1: ewma ≈ the raw series (all weight on today)
    val hot = Ewma.smooth(series, "k", "t", "x", alphaPpm = 999999L)
      .filter(col("t") === 10).head().getAs[Long]("ewma")
    assert(hot >= 999L)
    // α near 0: yesterday dominates — the spike barely registers
    val cold = Ewma.smooth(series, "k", "t", "x", alphaPpm = 1L)
      .filter(col("t") === 10).head().getAs[Long]("ewma")
    assert(cold <= 1L)
  }
}
