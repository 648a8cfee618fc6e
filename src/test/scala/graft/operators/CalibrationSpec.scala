package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)], bins: Int = 10) =
    Calibration.report(rows.toDF("conf_ppm", "correct"), "conf_ppm", "correct", bins)
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("per-bin means, accuracies, gaps, and ECE are exact integer arithmetic") {
    // bin 1: confs 150000/170000, 1 of 2 correct -> mean 160000, acc 500000
    // bin 8: confs 850000/850000/890000, 3 of 3 -> mean 863333, acc 1000000
    val rows = Seq(
      (150000L, true), (170000L, false),
      (850000L, true), (850000L, true), (890000L, true))
    // ECE = floor((2*340000 + 3*136667) / 5) = floor(1090001/5) = 218000
    val out = run(rows)
    assert(out(1L) == ((1L, 2L, 1L, 160000L, 500000L, 340000L, 218000L)))
    assert(out(8L) == ((8L, 3L, 3L, 863333L, 1000000L, 136667L, 218000L)))
  }

  test("a perfectly calibrated constant scorer has zero gap and zero ECE") {
    // conf 500000 everywhere, exactly half correct
    val rows = (0 until 100).map(i => (500000L, i % 2 == 0))
    val out = run(rows)
    assert(out.keySet == Set(5L))
    assert(out(5L)._6 == 0L && out(5L)._7 == 0L)
  }

  test("the top edge conf=1e6 folds into the last bin, never bin `bins`") {
    val out = run(Seq((1000000L, true), (999999L, true)))
    assert(out.keySet == Set(9L))
    assert(out(9L)._2 == 2L)
  }

  test("bin count is respected and the report is repartition-invariant") {
    val rows = (0L until 1000L).map(i => (i * 1000L, i % 3 == 0))
    val base = Calibration.report(rows.toDF("conf_ppm", "correct"),
      "conf_ppm", "correct", bins = 4).collect().toSet
    assert(base.map(_.getAs[Long]("bin")).subsetOf(Set(0L, 1L, 2L, 3L)))
    val rep = Calibration.report(
      rows.toDF("conf_ppm", "correct").repartition(13),
      "conf_ppm", "correct", bins = 4).collect().toSet
    assert(rep == base)
  }
}
