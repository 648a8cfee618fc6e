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
