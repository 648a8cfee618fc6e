package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("two shifted groups land on one common scale; exact discrete mapping") {
    // A = {1,2,3,4}, B = {11,12,13,14}: global cum 1..4 then 5..8 (n=8).
    // A's within-group ranks are 25/50/75/100% → global q(p):
    //   q(250000) = min{s : cum·1e6 >= 2e6} = 2, q(500000) = 4,
    //   q(750000) = 12, q(1000000) = 14 — and B maps to the SAME scale.
    val rows = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(11L, 12L, 13L, 14L).map(("B", _))).toDF("src", "score")
    val m = Curation.quantileNormalize(rows, "src", "score")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("p_ppm"), r.getAs[Long]("norm_score")))).toMap
    assert(m(("A", 1L)) == ((250000L, 2L)) && m(("A", 2L)) == ((500000L, 4L))
      && m(("A", 3L)) == ((750000L, 12L)) && m(("A", 4L)) == ((1000000L, 14L)))
    assert(m(("B", 11L)) == ((250000L, 2L)) && m(("B", 12L)) == ((500000L, 4L))
      && m(("B", 13L)) == ((750000L, 12L)) && m(("B", 14L)) == ((1000000L, 14L)))
  }

  test("a group that IS the corpus maps to the identity; repartition-invariant") {
    val rows = spark.range(500).select(lit("only").as("src"),
      (col("id") % 37).as("score"))
    val m = Curation.quantileNormalize(rows, "src", "score").collect()
    assert(m.nonEmpty)
    m.foreach(r => assert(r.getLong(1) == r.getAs[Long]("norm_score"),
      s"identity violated at score ${r.getLong(1)}"))
    val rep = Curation.quantileNormalize(rows.repartition(13), "src", "score")
      .orderBy("score").collect().toSeq
    val base = Curation.quantileNormalize(rows, "src", "score")
      .orderBy("score").collect().toSeq
    assert(rep == base)
  }
}
