package graft.operators

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatasetSketchSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Plain-Scala reference: the distinct md5 set of word 3-grams. */
  private def shingleSet(texts: Seq[String]): Set[String] =
    texts.flatMap { t =>
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(ws => md5hex(ws.mkString(" ")))
    }.toSet

  private val corpus = Seq(
    // srcA and srcB share one doc verbatim; srcC is disjoint.
    ("A", "the quick brown fox jumps over the lazy dog"),
    ("A", "pack my box with five dozen liquor jugs"),
    ("B", "the quick brown fox jumps over the lazy dog"),
    ("B", "how vexingly quick daft zebras jump today"),
    ("C", "entirely different text with no shared trigrams here at all"),
    ("C", "tiny"), // < 3 words: contributes nothing
    ("D", "so")    // source with NO shingles: absent from sketches
  )

  test("kmv sketch is the ascending k-smallest distinct hash set") {
    val df = corpus.toDF("source", "text")
    val got = DatasetSketch.kmvSketches(df, k = 4, shingleK = 3, groupCol = "source")
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1).toList, r.getLong(2)))).toMap
    assert(!got.contains("D"))
    for (g <- Seq("A", "B", "C")) {
      val exact = shingleSet(corpus.filter(_._1 == g).map(_._2))
      val (kmv, n) = (got(g)._1, got(g)._2)
      assert(n == exact.size, s"source $g n_distinct")
      assert(kmv == exact.toList.sorted.take(4), s"source $g bottom-4")
    }
  }

  test("estimate is exact when the sketch holds the whole union, zero when disjoint") {
    val df = corpus.toDF("source", "text")
    // k larger than any union: bottomk(A∪B) IS A∪B, so est == exact.
    val sk = DatasetSketch.kmvSketches(df, k = 1000, shingleK = 3)
    val est = DatasetSketch.pairEstimates(sk, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val sets = Seq("A", "B", "C")
      .map(g => g -> shingleSet(corpus.filter(_._1 == g).map(_._2))).toMap
    for (Seq(a, b) <- Seq("A", "B", "C").combinations(2)) {
      val inter = (sets(a) & sets(b)).size.toLong
      val union = (sets(a) | sets(b)).size.toLong
      assert(est((a, b)) == 1000000L * inter / union, s"pair ($a,$b)")
    }
    assert(est(("A", "C")) == 0L && est(("B", "C")) == 0L)
  }

  test("sketches and estimates are partitioning-independent") {
    val base = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    def run(parts: Int): Seq[String] = {
      val sk = DatasetSketch.kmvSketches(base.repartition(parts), k = 32)
      DatasetSketch.pairEstimates(sk, k = 32)
        .orderBy("src_a", "src_b")
        .collect().map(_.mkString("|")).toSeq
    }
    assert(run(1) == run(13))
  }

  test("containment is exact with a whole-union sketch, NULL when a side has no sample") {
    val df = corpus.toDF("source", "text")
    val sk = DatasetSketch.kmvSketches(df, k = 1000, shingleK = 3)
    val got = DatasetSketch.containmentEstimates(sk, k = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    val sets = Seq("A", "B", "C")
      .map(g => g -> shingleSet(corpus.filter(_._1 == g).map(_._2))).toMap
    for (Seq(a, b) <- Seq("A", "B", "C").combinations(2)) {
      val inter = (sets(a) & sets(b)).size.toLong
      // k covers the whole union, so M∩A = A exactly: est == exact
      assert(got((a, b))._1.contains(1000000L * inter / sets(a).size),
        s"containment($a in $b)")
      assert(got((a, b))._2.contains(1000000L * inter / sets(b).size),
        s"containment($b in $a)")
    }
    // directionality: A∩B is a big share of either side here, while A∩C = 0
    assert(got(("A", "C"))._1.contains(0L))
    // NULL case: with k=1 and disjoint sources, the union's single bottom
    // hash lives in exactly one side — the other side has no sample
    val sk1 = DatasetSketch.kmvSketches(
      Seq(("X", "one two three"), ("Y", "four five six seven")).toDF("source", "text"),
      k = 1, shingleK = 3)
    val row = DatasetSketch.containmentEstimates(sk1, k = 1).collect().head
    assert(row.isNullAt(4) ^ row.isNullAt(5),
      "exactly one direction must carry no evidence at k=1 on disjoint sources")
  }

  test("containment detects a near-subset the symmetric Jaccard hides") {
    // BIG has 60 docs; SUB is 6 of them verbatim: containment(SUB in BIG)
    // ≈ 1e6 while Jaccard is ~0.1 — the directional signal is the point.
    val big = (0 until 60).map(i =>
      ("BIG", s"document number $i talks about topic ${i % 7} in detail"))
    val sub = (0 until 6).map(i =>
      ("SUB", s"document number $i talks about topic ${i % 7} in detail"))
    val df = (big ++ sub).toDF("source", "text")
    val sk = DatasetSketch.kmvSketches(df, k = 64, shingleK = 3)
    val r = DatasetSketch.containmentEstimates(sk, k = 64).collect().head
    val (cBigInSub, cSubInBig) = (r.getLong(4), r.getLong(5))
    assert(cSubInBig == 1000000L, "every SUB shingle is in BIG")
    assert(cBigInSub < 400000L, "BIG is mostly NOT in SUB")
    val j = DatasetSketch.pairEstimates(sk, k = 64).collect().head.getLong(4)
    assert(j < cSubInBig / 2, "Jaccard alone would hide the subset relation")
  }

  test("incremental refresh equals the from-scratch sketch bit-for-bit") {
    val base = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    // split the corpus by doc hash: old half sketched, new half refreshed in
    val half = abs(xxhash64(col("doc_id"))) % 2
    val oldSk = DatasetSketch.kmvSketches(base.filter(half === 0), k = 64)
    val refreshed = DatasetSketch
      .refreshSketches(oldSk, base.filter(half === 1), k = 64)
      .orderBy("g").collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
    val scratch = DatasetSketch.kmvSketches(base, k = 64)
      .orderBy("g").collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
    assert(refreshed.toSeq == scratch.toSeq,
      "bottom-k(old sketch ∪ batch) must equal bottom-k over the whole corpus")
    // group present only in the old sketches carries over verbatim
    val onlyOld = DatasetSketch.refreshSketches(
      oldSk, Seq.empty[(String, String)].toDF("source", "text"), k = 64)
      .orderBy("g").collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
    assert(onlyOld.toSeq == oldSk.orderBy("g").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toSeq)
  }

  test("estimate tracks exact Jaccard within the 1/sqrt(k) error class on real docs") {
    val base = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val sk = DatasetSketch.kmvSketches(base, k = 128)
    val est = DatasetSketch.pairEstimates(sk, k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val rows = base.select(col("source"), col("text").as("t"))
      .as[(String, String)].collect()
    val sets = rows.groupBy(_._1).map { case (g, rs) => g -> shingleSet(rs.map(_._2).toSeq) }
    for (((a, b), e) <- est) {
      val inter = (sets(a) & sets(b)).size.toLong
      val union = (sets(a) | sets(b)).size.toLong
      val exact = if (union == 0) 0L else 1000000L * inter / union
      // 4 sigma at k=128 ≈ 0.35 absolute — generous, deterministic data.
      assert(math.abs(e - exact) <= 350000L, s"pair ($a,$b): est $e exact $exact")
    }
  }
}
