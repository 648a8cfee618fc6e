package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationNegativesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")

  test("negative pairs: no self-pairs, negatives are corpus members, <= k per doc") {
    val pairs = Curation.negativePairs(docs, "doc_id", negsPerDoc = 3, buckets = 16)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a != b })
    val ids = (1L to 200L).map(_.toString).toSet
    assert(pairs.forall { case (a, b) => ids(a) && ids(b) })
    val perDoc = pairs.groupBy(_._1).map(_._2.length)
    assert(perDoc.max <= 3)
    assert(pairs.distinct.length == pairs.length) // duplicate draws collapsed
  }

  test("pairs are a pure function of ids: identical across partitionings") {
    val a = Curation.negativePairs(docs, "doc_id", 3, 16)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = Curation.negativePairs(docs.repartition(7), "doc_id", 3, 16)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("only bucket representatives (min id per cell) serve as negatives") {
    val pairs = Curation.negativePairs(docs, "doc_id", 3, 16)
    val negs = pairs.select("neg_id").distinct()
      .collect().map(_.getString(0)).toSet
    val reps = docs.select(col("doc_id").cast("string").as("id"))
      .groupBy((graft.expressions.PolyHash(
        concat(lit("negbkt|"), col("id"))) % 16).as("b"))
      .agg(min(col("id")).as("rep"))
      .collect().map(_.getAs[String]("rep")).toSet
    assert(negs.subsetOf(reps))
  }

  test("empty corpus yields no pairs") {
    assert(Curation.negativePairs(docs.limit(0), "doc_id", 3, 16).isEmpty)
  }

  test("epoch salt rotates representatives and draws, each epoch deterministic") {
    def pairs(salt: String) =
      Curation.negativePairs(docs, "doc_id", 3, 16, salt = salt)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val e0a = pairs("")
    val e1 = pairs("e1")
    assert(pairs("") == e0a, "same salt must replay identically")
    assert(e1 != e0a, "different epochs should draw different pairings")
    // rotated representatives: epoch 1 uses negatives epoch 0 never elects
    assert((e1.map(_._2) -- e0a.map(_._2)).nonEmpty)
  }
}
