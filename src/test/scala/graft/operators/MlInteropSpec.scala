package graft.operators

import graft.SparkSpec
import org.apache.spark.ml.{Pipeline => MlPipeline}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, Tokenizer}
import org.apache.spark.sql.functions._

/** Interop with Spark ML pipeline abstractions (north-star requirement):
  * an `org.apache.spark.ml.Pipeline` — the ML analog of the reference's
  * stage chain — runs INSIDE a graft FramePipeline stage, so feature
  * extraction / clustering composes with the relational curation operators
  * on one DataFrame plan. Fit happens where the reference would do heavy
  * stage init (onStart analog: driver-side, once); transform is the
  * per-record stage body.
  */
class MlInteropSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join scan filter join scan"),
    (2L, "spark join scan filter scan scan"),
    (3L, "vector cosine embed nearest neighbor"),
    (4L, "vector cosine embed nearest embed"),
    (5L, "spark join scan join filter scan")
  ).toDF("doc_id", "text")

  test("an ml.Pipeline (tokenize -> tf -> kmeans) runs as a FramePipeline stage") {
    val ml = new MlPipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("toks"),
      new HashingTF().setInputCol("toks").setOutputCol("tf").setNumFeatures(64),
      new KMeans().setK(2).setSeed(42).setMaxIter(5).setFeaturesCol("tf")))
    val model = ml.fit(docs) // driver-side once — the onStart analog
    val out = graft.core.FramePipeline.of(docs)
      .append("ml_cluster")(df => model.transform(df))
      .append("project")(_.select(col("doc_id"), col("prediction")))
      .build()
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // the spark-y docs (1,2,5) must land together, the vector-y docs (3,4)
    // together, in different clusters — seed pinned, so this is stable
    assert(out(1L) == out(2L) && out(2L) == out(5L))
    assert(out(3L) == out(4L))
    assert(out(1L) != out(3L))
    // determinism across re-transform (same model, same data)
    val again = model.transform(docs).select("doc_id", "prediction")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == out)
  }

  test("ml feature columns flow through curation operators unchanged") {
    // ML vectors ride a DataFrame like any column: dedup the corpus first,
    // then cluster survivors — the composition order a real curation
    // pipeline uses (never featurize what dedup will drop)
    val withDup = docs.unionAll(Seq((6L, "spark join scan filter join scan"))
      .toDF("doc_id", "text")) // exact dup of doc 1
    val fp = Dedup.exact(withDup)
    assert(fp.count() == 5) // 6 docs, 5 groups
    val survivors = withDup.join(
      fp.select(col("keep_id").as("doc_id")), "doc_id")
    assert(survivors.count() == 5)
    assert(!survivors.collect().map(_.getLong(0)).contains(6L))
  }
}
