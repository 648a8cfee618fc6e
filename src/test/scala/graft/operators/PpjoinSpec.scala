package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PpjoinSpec extends SparkSpec {
  import spark.implicits._

  /** Independent brute force: all pairs with shingle Jaccard >= t ppm. */
  private def brute(docs: Seq[(Long, String)], k: Int, tPpm: Long)
      : Set[(Long, Long, Long, Long, Long)] = {
    // mirrors TextFunctions.shingles: fewer than k words => NO shingles
    def shingleSet(t: String): Set[String] = {
      val ws = t.split(" ").filter(_.nonEmpty)
      if (ws.length < k) Set.empty
      else ws.sliding(k).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => (id, shingleSet(t)) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      union = (sa ++ sb).size.toLong
      j = 1000000L * inter / union if j >= tPpm
    } yield (a, b, inter, union, j)).toSet
  }

  private def run(docs: Seq[(Long, String)], tPpm: Long)
      : Set[(Long, Long, Long, Long, Long)] =
    Dedup.ppjoinPairs(docs.toDF("doc_id", "text"), shingleK = 3,
      thresholdPpm = tPpm)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("no false negatives and no extras vs brute force on a near-dup corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val bases = (0 until 20).map { i =>
      (0 until 10 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(12))).mkString(" ")
    }
    // each base gets a light mutation (one word appended) => high-J pairs
    val docs = bases.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong * 2, t), (i.toLong * 2 + 1, t + " " + vocab(rnd.nextInt(12))))
    }
    for (t <- Seq(300000L, 500000L, 800000L)) {
      val expect = brute(docs, 3, t)
      assert(run(docs, t) == expect, s"threshold $t")
      assert(expect.nonEmpty, s"vacuous at $t") // near-dup pairs must exist
    }
  }

  test("threshold boundary is inclusive and the length filter admits the edge case") {
    // {abc, bcd} vs {abc}: inter 1, union 2 -> exactly 500000
    val docs = Seq((1L, "a b c d"), (2L, "a b c"))
    assert(run(docs, 500000L) ==
      Set((1L, 2L, 1L, 2L, 500000L)))
    assert(run(docs, 500001L).isEmpty)
  }

  test("identical docs pair at exactly 1e6; deterministic under repartition") {
    val docs = Seq((5L, "x y z w v"), (9L, "x y z w v"), (7L, "p q r s t"))
    val out = run(docs, 900000L)
    assert(out == Set((5L, 9L, 3L, 3L, 1000000L)))
    val df = docs.toDF("doc_id", "text").repartition(7)
    val rep = Dedup.ppjoinPairs(df, 3, 900000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(rep == out)
  }
}
