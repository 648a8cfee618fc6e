package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmSpec extends SparkSpec {
  import spark.implicits._

  // ref corpus: "a b" ×3, "a c" ×1 → P(b|a)=3/4, P(c|a)=1/4; "b d" once.
  private val ref = Seq(
    "a b", "a b", "a b x", // "b x" adds a second left-word family
    "a c", "b d"
  ).toDF("text")

  test("fitBigram: conditionals are floor(1e6·C(ab)/C(a·)) per LEFT word") {
    val lm = Lm.fitBigram(ref).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lm("a b") == 750000L) // 3/4
    assert(lm("a c") == 250000L) // 1/4
    assert(lm("b x") == 500000L) // b· = {b x, b d}
    assert(lm("b d") == 500000L)
    // conditionals for one left word sum to ~1e6 (floor loss only)
    val byA = lm.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum)
    byA.foreach { case (_, s) => assert(s > 999998L && s <= 1000000L) }
  }

  test("perplexityBuckets: OOV backs off to 1, short docs drop, means exact") {
    val lm = Lm.fitBigram(ref)
    val target = Seq(
      (1L, "a b a c"),   // transitions: a b(750000), b a(OOV=1), a c(250000)
      (2L, "z z z"),     // all OOV → mean 1
      (3L, "solo"),      // one word, no transitions → excluded
      (4L, "")           // empty → excluded
    ).toDF("doc_id", "text")
    val out = Lm.perplexityBuckets(target, lm, headMin = 300000L, midMin = 10L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("mean_scaled"),
          r.getAs[String]("bucket")))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 333333L, "head"))) // floor(1000001/3)
    assert(out(2L) == ((2L, 1L, "tail")))
    intercept[IllegalArgumentException] {
      Lm.perplexityBuckets(target, lm, headMin = 10L, midMin = 10L)
    }
  }

  test("scoring is engine-deterministic: identical across partitionings") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a"), lit("b"),
        concat(lit("w"), pmod(col("id"), lit(7))),
        lit("a"), lit("c")).as("text"))
    val lm = Lm.fitBigram(ref)
    def run(parts: Int) =
      Lm.perplexityBuckets(docs.repartition(parts), lm, 300000L, 10L)
        .groupBy("bucket").agg(count(lit(1)).as("n"),
          sum(col("mean_scaled")).as("sm"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(13))
  }
}
