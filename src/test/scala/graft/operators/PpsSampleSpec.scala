package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PpsSampleSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("exactly k rows, zero-word docs excluded, repartition-deterministic") {
    val docs = ((1L to 100L).map(i => (i, words((i % 7).toInt + 1)))
      :+ (999L, "")).toDF("doc_id", "text")
    val a = Curation.ppsSample(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.length == 10)
    assert(!a.exists(_._1 == 999L))
    val b = Curation.ppsSample(docs.repartition(13), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSet == b.toSet)
  }

  test("priority and Horvitz-Thompson weight arithmetic replay exactly") {
    val docs = (1L to 50L).map(i => (i, words((i % 9).toInt + 1))).toDF("doc_id", "text")
    val k = 7
    // independent recomputation of every doc's priority and the total
    val ref = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.words(col("text"))).cast("long").as("w"),
        ((graft.expressions.PolyHash(concat(lit("pps|"),
          col("doc_id").cast("string"))) % 1000000000L) + 1L).as("u"))
      .select(col("doc_id"), col("w"), expr("(u * 1000000) DIV w").as("pr"))
      .as[(Long, Long, Long)].collect()
    val wTotal = ref.map(_._2).sum
    val expect = ref.sortBy(r => (r._3, r._1)).take(k)
      .map(r => (r._1, r._2, r._3, wTotal * 1000000L / (k * r._2))).toSet
    val got = Curation.ppsSample(docs, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("inclusion probability grows with document size (measured across salts)") {
    // w=9 vs w=1, k=1: P(big wins) = P(u1/9 < u2) ~ 0.944 for uniform u
    val docs = Seq((1L, words(9)), (2L, words(1))).toDF("doc_id", "text")
    val wins = (0 until 60).count { s =>
      Curation.ppsSample(docs, k = 1, salt = s.toString)
        .select("doc_id").head().getLong(0) == 1L
    }
    assert(wins >= 45, s"big doc won only $wins/60 draws")
  }
}
