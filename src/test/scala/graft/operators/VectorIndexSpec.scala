package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The stored-index contract: searching a written index returns IDENTICAL
  * rows to the one-shot ivfPqTopK pipeline given the same fits — not just
  * similar recall — and incremental appends encode with the frozen stored
  * fits. */
class VectorIndexSpec extends SparkSpec {

  private def emb = Tables.table(spark, sf(), "embeddings")
  private def qs = emb.filter(col("vec_id") < 20)

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getInt(3))).toSet

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-vindex-$tag").toString

  test("stored-index search equals the one-shot IVFADC answer (non-residual)") {
    val cf = Similarity.fitCoarseQuantizer(emb, nCentroids = 8)
    val pf = Similarity.fitPqCodebooks(emb, m = 8, ks = 8)
    val oneShot = Similarity.ivfPqTopK(emb, qs, k = 3,
      nCentroids = 8, nProbe = 4, m = 8, ks = 8, refine = 8,
      residual = false, coarseFitted = Some(cf), fitted = Some(pf))
    val dir = tmp("plain")
    VectorIndex.write(emb, dir, m = 8, ks = 8, residual = false,
      coarseFitted = Some(cf), fitted = Some(pf))
    val fromIndex = VectorIndex.search(qs, dir, k = 3, nProbe = 4, refine = 8)
    assert(rows(fromIndex) == rows(oneShot))
    assert(fromIndex.count() > 0)
  }

  test("stored-index search equals the one-shot answer (residual mode)") {
    val cf = Similarity.fitCoarseQuantizer(emb, nCentroids = 8)
    val pf = Similarity.fitResidualPqCodebooks(emb, cf, m = 8, ks = 8)
    val oneShot = Similarity.ivfPqTopK(emb, qs, k = 3,
      nCentroids = 8, nProbe = 4, m = 8, ks = 8, refine = 8,
      residual = true, coarseFitted = Some(cf), fitted = Some(pf))
    val dir = tmp("residual")
    VectorIndex.write(emb, dir, m = 8, ks = 8, residual = true,
      coarseFitted = Some(cf), fitted = Some(pf))
    val fromIndex = VectorIndex.search(qs, dir, k = 3, nProbe = 4, refine = 8)
    assert(rows(fromIndex) == rows(oneShot))
  }

  test("auto nProbe rides the stored cell count") {
    val dir = tmp("auto")
    VectorIndex.write(emb, dir, nCentroids = 0, m = 8, ks = 8)
    // auto cells at 500 vectors → 23; auto probes → ceil(3·√23) = 15 —
    // sanity: the search runs and fills k slots for every query
    val got = VectorIndex.search(qs, dir, k = 3, nProbe = 0, refine = 8)
    assert(got.groupBy("q_id").count().filter(col("count") =!= 3).isEmpty)
  }

  test("a torn index (one component rebuilt without restamping) fails loud") {
    val dir = tmp("torn")
    VectorIndex.write(emb, dir, nCentroids = 8, m = 8, ks = 8)
    VectorIndex.search(qs, dir, k = 3, nProbe = 4, refine = 8).count()
    // simulate a crashed partial rebuild: codebooks rewritten alone — the
    // parquet overwrite wipes the generation stamp, and codes encoded
    // against the OLD codebooks would score garbage distances silently
    spark.read.parquet(s"$dir/codebooks")
      .write.mode("overwrite").parquet(s"$dir/codebooks.tmp")
    spark.read.parquet(s"$dir/codebooks.tmp")
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    val e = intercept[IllegalStateException] {
      VectorIndex.search(qs, dir, k = 3, nProbe = 4, refine = 8)
    }
    assert(e.getMessage.contains("torn or stale"), e.getMessage)
    // appendBatch goes through the same choke point
    val e2 = intercept[IllegalStateException] {
      VectorIndex.appendBatch(emb.limit(5), dir)
    }
    assert(e2.getMessage.contains("torn or stale"))
  }

  test("appendBatch: incremental codes equal a from-scratch build with the same fits") {
    val cf = Similarity.fitCoarseQuantizer(emb, nCentroids = 8)
    val pf = Similarity.fitPqCodebooks(emb, m = 8, ks = 8)
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val incDir = tmp("inc")
    VectorIndex.write(first, incDir, m = 8, ks = 8,
      coarseFitted = Some(cf), fitted = Some(pf))
    VectorIndex.appendBatch(second, incDir)
    val fullDir = tmp("full")
    VectorIndex.write(emb, fullDir, m = 8, ks = 8,
      coarseFitted = Some(cf), fitted = Some(pf))
    // the appended half must carry the same (cluster, codes) the one-pass
    // build assigns — frozen fits make encode a pure map
    val inc = spark.read.parquet(s"$incDir/codes")
      .select(col("vid"), col("cluster"), col("codes").cast("array<int>"))
    val full = spark.read.parquet(s"$fullDir/codes")
      .select(col("vid"), col("cluster"), col("codes").cast("array<int>"))
    assert(inc.count() == full.count())
    assert(inc.join(full, Seq("vid", "cluster", "codes")).count() == full.count())
    // and the search over the incrementally-built index equals the search
    // over the one-pass index
    val a = VectorIndex.search(qs, incDir, k = 3, nProbe = 4, refine = 8)
    val b = VectorIndex.search(qs, fullDir, k = 3, nProbe = 4, refine = 8)
    assert(rows(a) == rows(b))
  }
}
