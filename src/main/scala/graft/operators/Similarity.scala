package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small, broadcast) query
  *    set against the full corpus — the correctness baseline. The corpus side
  *    streams; only queries are broadcast, so it scales to any corpus size
  *    at O(|corpus| × |queries|) work.
  *  - [[lshTopK]]: hyperplane-LSH bucketed variant — corpus and queries are
  *    bucketed by signature, candidates only meet within a bucket (one
  *    shuffle on the bucket key), then exact cosine ranks candidates. The
  *    100 TB path: work is O(bucket²) per bucket instead of |corpus| per
  *    query. Recall is tuned by `planes` (fewer planes → bigger buckets →
  *    higher recall) and `tables` (independent signatures OR'd together).
  */
object Similarity {

  private def withVec(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val c = withVec(corpus, idCol, vecCol)
    val q = withVec(queries, idCol, vecCol)
      .withColumnRenamed("vid", "q_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    val scored = c.join(broadcast(q), col("vid") =!= col("q_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("neighbor_id"), col("sim"))
  }

  /** Attribute-filtered exact top-k: each query searches only the corpus
    * rows satisfying a per-(query,corpus) predicate — e.g. same label,
    * same tenant, a date range. The filter applies BEFORE scoring (inside
    * the join condition), so the dot-product work and the ranking window
    * shrink to the filtered slice: pre-filtering, not the post-filter
    * trap where top-k fills with rows the predicate then discards and
    * recall silently drops. At scale this is the "filtered vector search"
    * capability — compose with lshTopK's bucketing by conjoining the
    * bucket equality when the slice is still too large to scan.
    *
    * `filter` receives (corpusRow, queryRow) column scopes aliased as
    * `c` and `q` — e.g. `col("c.label") === col("q.label")`. */
  def filteredTopK(
      corpus: DataFrame,
      queries: DataFrame,
      filter: Column,
      k: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // norms staged scan-side: one fold per ROW before the join, not one
    // per candidate pair
    val c = corpus.withColumn("__v", asDouble(col(vecCol)))
      .withColumn("__nrm", norm2(col("__v"))).as("c")
    val q = queries.withColumn("__v", asDouble(col(vecCol)))
      .withColumn("__nrm", norm2(col("__v"))).as("q")
    val scored = c.join(broadcast(q),
        col(s"c.$idCol") =!= col(s"q.$idCol") && filter)
      .select(col(s"q.$idCol").as("q_id"), col(s"c.$idCol").as("nid"),
        (dot(col("q.__v"), col("c.__v"))
          / (col("q.__nrm") * col("c.__nrm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("nid").as("neighbor_id"), col("sim"),
        col("rn").cast("int").as("rank"))
  }

  /** IVF (inverted-file) ANN: cluster the corpus into `nCentroids` cells
    * with spherical KMeans (KMeans over L2-normalized vectors, so Euclidean
    * cell assignment coincides with cosine — the metric the search targets),
    * then search each query only in its `nProbe` nearest cells, ranked by
    * the SAME metric the assignment used: ‖q̂ − c‖² = 1 + ‖c‖² − 2·q̂·c.
    * The 100 TB path where LSH recall is insufficient: the corpus shuffles
    * once on cluster id, per-query work is bounded by cell size × nProbe,
    * and the (tiny) centroid table broadcasts. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 3,
      nCentroids: Int = 16,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.Normalizer
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    // persist: KMeans re-scans the features once per iteration.
    // Normalizer (not a transform() lambda) computes the norm once per row.
    val c = new Normalizer().setInputCol("fraw").setOutputCol("features").setP(2.0)
      .transform(withVec(corpus, idCol, vecCol)
        .withColumn("fraw", array_to_vector(col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans().setK(nCentroids).setSeed(42).setMaxIter(3)
      .setFeaturesCol("features").fit(c)
    // the cache existed for KMeans' per-iteration re-scans; release it now —
    // the single downstream assignment pass recomputes from lineage (scan +
    // normalize), so repeated ivfTopK calls don't accumulate cache entries
    c.unpersist(blocking = false)
    val assigned = model.transform(c)
      .select(col("vid"), col("v"), col("nrm"), col("prediction").as("cluster"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (cv, i) =>
        (i, cv.toArray.toSeq, cv.toArray.map(x => x * x).sum) }
      .toSeq.toDF("cluster", "cvec", "cnorm2")
    val q = withVec(queries, idCol, vecCol)
      .withColumnRenamed("vid", "q_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    // nProbe nearest cells per query, by the assignment metric: Euclidean
    // distance between the normalized query and the centroid (the constant
    // ‖q̂‖² = 1 term drops out of the ranking). Centroid table broadcast.
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cdist"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        col("cnorm2") - lit(2.0) * dot(col("qv"), col("cvec")) / col("qnrm"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("q_id"), col("qv"), col("qnrm"), col("cluster"))
    val cand = probes.join(assigned, "cluster")
      .filter(col("vid") =!= col("q_id"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vid"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("neighbor_id"), col("sim"),
        col("rn").cast("int").as("rank"))
  }

  /** Product-quantization ANN (IVF-less ADC scan): split the D-dim space
    * into `m` subspaces, train a `ks`-centroid codebook per subspace
    * (seeded KMeans over the spherically-normalized corpus subvectors),
    * encode every corpus vector as `m` small codes, and rank candidates by
    * asymmetric distance computation — each query precomputes an m×ks
    * table of subvector→centroid distances once, and a corpus vector's
    * approximate distance is just `m` table lookups summed.
    *
    * The 100 TB path when even one float dot per corpus row is too much:
    * the scan side carries m bytes per vector instead of D floats (m=8,
    * ks=256 compresses a 768-dim float corpus 384×), the codebooks and
    * per-query tables broadcast, and the scan does no full-width
    * arithmetic at all. Encoding is a one-time pass (m chained KMeans
    * assignments fused into one scan by Catalyst); `trainFraction`
    * subsamples codebook training, which at corpus scale runs on a sample
    * by construction.
    *
    * Ranking is by approximate distance `Σᵢ ‖q̂ᵢ − C[i][codeᵢ]‖²`; since
    * `‖q̂‖² = 1` is constant per query, the table stores the rank-equivalent
    * `‖C[i][j]‖² − 2·q̂ᵢ·C[i][j]` (cosine-faithful on normalized vectors).
    *
    * ADC is a shortlist metric, not a final ranking: quantization noise
    * swamps the tiny margins between true top-k candidates, so the scan
    * keeps the best `k·refine` rows per query by ADC and re-ranks that
    * shortlist with exact cosine (the standard two-stage PQ design — the
    * exact pass touches `k·refine` vectors per query, not the corpus). */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 3,
      m: Int = 4,
      ks: Int = 16,
      refine: Int = 8,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      minShortlistFraction: Double = 0.04
  ): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    // same up-front guards as lshTopK, but per side: an empty CORPUS must
    // return the empty typed result BEFORE KMeans is asked to fit nothing,
    // and ragged dims would silently mis-slice subvectors
    // same cross-input construction as lshTopK: neighbor_id must carry the
    // corpus id type, not the queries one
    val emptyResult = queries.select(col(idCol).as("q_id")).limit(0)
      .crossJoin(corpus.select(col(idCol).as("neighbor_id")).limit(0))
      .withColumn("sim", lit(0.0)).withColumn("rank", lit(0))
    def stats(df: DataFrame) = df
      .agg(min(size(col(vecCol))).as("mn"), max(size(col(vecCol))).as("mx"),
        count(lit(1)).as("n")).head()
    val cs = stats(corpus)
    if (cs.isNullAt(0)) return emptyResult
    val qs = stats(queries)
    if (qs.isNullAt(0)) return emptyResult
    require(cs.getInt(0) == cs.getInt(1) && qs.getInt(0) == qs.getInt(1)
      && cs.getInt(0) == qs.getInt(0),
      s"pqTopK: vector column '$vecCol' has mixed dimensionality " +
        s"(corpus ${cs.getInt(0)}..${cs.getInt(1)}, " +
        s"queries ${qs.getInt(0)}..${qs.getInt(1)})")
    val dim = cs.getInt(0)
    require(dim % m == 0, s"pqTopK: dim $dim not divisible into $m subspaces")
    val sd = dim / m

    def normalized(df: DataFrame) = withVec(df, idCol, vecCol)
      .withColumn("vh", transform(col("v"), x => x / col("nrm")))
    def sub(c: org.apache.spark.sql.Column, i: Int) = slice(c, i * sd + 1, sd)

    // ---- train: one seeded KMeans per subspace, all over one cached scan
    val trainBase = {
      val n = normalized(corpus)
      if (trainFraction < 1.0) n.sample(withReplacement = false, trainFraction, seed = 42)
      else n
    }
    val train = (0 until m).foldLeft(trainBase) { (df, i) =>
      df.withColumn(s"f_$i", array_to_vector(sub(col("vh"), i)))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The m codebook fits are independent — submit them as CONCURRENT Spark
    // jobs over the one cached training scan (sequential fits pay m × the
    // per-iteration job-scheduling latency; measured 3× wall-clock on the
    // m=8 bench query). Determinism is per-fit (seeded), unaffected by
    // completion order.
    val models = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence((0 until m).map { i =>
        Future {
          new KMeans().setK(ks).setSeed(42 + i).setMaxIter(5)
            .setFeaturesCol(s"f_$i").setPredictionCol(s"c_$i").fit(train)
        }
      }.toIndexedSeq), Duration.Inf)
    }
    train.unpersist(blocking = false)

    // ---- encode the corpus: m chained assignments, fused into one scan
    val encodedBase = (0 until m).foldLeft(normalized(corpus)) { (df, i) =>
      df.withColumn(s"f_$i", array_to_vector(sub(col("vh"), i)))
    }
    val encoded = models.zipWithIndex
      .foldLeft(encodedBase) { case (df, (mod, _)) => mod.transform(df) }
      .select(col("vid"),
        array((0 until m).map(i => col(s"c_$i")): _*).as("codes"))

    // ---- per-query ADC table: dtab[i][j] = ‖C[i][j]‖² − 2·q̂ᵢ·C[i][j],
    // one native dot per (subspace, centroid) per query — m·ks tiny dots
    val q = normalized(queries).select(col("vid").as("q_id"), col("vh").as("qvh"))
    val dtab = array(models.zipWithIndex.map { case (mod, i) =>
      array(mod.clusterCenters.toIndexedSeq.map { cv =>
        val c = cv.toArray
        lit(c.map(x => x * x).sum) -
          lit(2.0) * dot(sub(col("qvh"), i), lit(c))
      }: _*)
    }: _*)
    val qt = q.withColumn("dtab", dtab).select("q_id", "qvh", "dtab")

    // ---- ADC scan: m lookups + adds per (corpus row, query); queries
    // (with their tables) broadcast, the corpus side never re-touches floats
    val scored = encoded.join(broadcast(qt), col("vid") =!= col("q_id"))
      .withColumn("adist",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, i) => acc +
            element_at(element_at(col("dtab"), i + 1),
              element_at(col("codes"), i + 1) + 1)))
    // Shortlist size: k·refine, FLOORED at a fraction of the corpus — a
    // fixed multiplier tuned at one scale silently decays as the corpus
    // grows (recall@3 measured 0.83 → 0.51 going 500 → 5000 vectors with a
    // constant 24-row shortlist). The floor must also absorb per-session
    // codebook jitter (KMeans init samples depend on input partitioning):
    // at 2% of 5000 the recall straddled the 0.6 oracle bar across
    // sessions (0.59–0.81); 4% holds it clear of the bar while remaining a
    // vanishing fraction of the ADC scan it prunes.
    val shortlistN = math.max(k.toLong * refine,
      math.ceil(cs.getLong(2) * minShortlistFraction).toLong)
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("vid"))
    val shortlist = scored
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= shortlistN)
      .select(col("q_id"), col("qvh"), col("vid"))

    // ---- exact re-rank of the shortlist: k·refine exact cosines per query
    // (the shortlist is tiny and broadcasts back onto the corpus vectors)
    val cvecs = normalized(corpus).select(col("vid"), col("vh"))
    val exact = broadcast(shortlist).join(cvecs, "vid")
      .withColumn("sim", dot(col("qvh"), col("vh")))
    val wExact = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vid"))
    exact.withColumn("rn", row_number().over(wExact)).filter(col("rn") <= k)
      .select(col("q_id"), col("vid").as("neighbor_id"), col("sim"),
        col("rn").cast("int").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs over a corpus subset: exact
    * all-pairs within the (broadcastable) subset — the correctness oracle
    * for the LSH/IVF paths. */
  def cosineNearDupPairs(
      vecs: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val v = withVec(vecs, idCol, vecCol)
    v.as("a").join(broadcast(v.as("b")), col("a.vid") < col("b.vid"))
      .withColumn("sim",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.vid").as("a_id"), col("b.vid").as("b_id"), col("sim"))
  }

  /** SemDeDup-style semantic near-duplicate pruning (Abbas et al. 2023,
    * arXiv:2303.09540): partition the embedding space into deterministic
    * hyperplane cells, compute pairwise cosine only WITHIN a cell, and drop
    * every vector that has a lower-id companion at cosine >= `tau` in its
    * cell; the lowest id of a duplicate neighborhood survives as the
    * representative. One pass, no iteration — a vector is dropped if ANY
    * lower-id cell-mate is within `tau`, whether that mate itself survives
    * (matches SemDeDup's one-shot per-cluster pruning; the paper clusters
    * with KMeans — the hyperplane code plays that role here because it is
    * engine-replayable, so the whole decision is hash-verifiable).
    *
    * Returns one row per input vector: (vec_id, cell, kept, rep_id) with
    * rep_id = the smallest companion that caused a drop, null when kept.
    *
    * 100 TB shape: one shuffle on the cell code; the quadratic step is
    * bounded per cell (`planes` sizes cells at ~n/2^planes — size it so the
    * worst cell's pair count is acceptable), and the pair join is an
    * equi-join on the cell key, never a cross-cell cartesian. The dedup
    * decision needs no global state beyond the per-cell neighborhood. */
  def semDedup(
      vecs: DataFrame,
      tau: Double,
      planes: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portableHash: Boolean = false
  ): DataFrame = {
    // Same up-front guard as lshTopK: empty input → empty typed result;
    // ragged vector dims → loud failure (ArrayDot would silently truncate).
    val dims = vecs.select(size(col(vecCol)).as("d"))
      .agg(min(col("d")).as("mn"), max(col("d")).as("mx")).head()
    // rep_id carries the ID COLUMN'S OWN type (min over a_id does in the
    // non-empty path) — a hardcoded long here would flip the schema with
    // input emptiness for int-typed ids
    val emptySchema = vecs.select(col(idCol).as("vec_id"), lit(0L).as("cell"),
      lit(true).as("kept"),
      lit(null).cast(vecs.schema(idCol).dataType).as("rep_id")).limit(0)
    if (dims.isNullAt(0)) return emptySchema
    require(dims.getInt(0) == dims.getInt(1),
      s"semDedup: vector column '$vecCol' has mixed dimensionality " +
        s"(${dims.getInt(0)}..${dims.getInt(1)}) — cell codes over truncated " +
        "vectors would be silently wrong")
    val dim = dims.getInt(0)
    val sig =
      if (portableHash) portableHyperplaneSig(col("v"), planes, dim, 0)
      else hyperplaneSig(col("v"), planes, dim, 0)
    // persisted: cells feeds BOTH sides of the within-cell pair join plus
    // the final decision select — the module's cache contract for
    // self-join pair-finders (without it the scan + signature evaluate up
    // to three times; aliased projections defeat exchange reuse)
    val cells = withVec(vecs, idCol, vecCol).withColumn("cell", sig)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = cells.select(col("vid").as("a_id"), col("cell").as("a_cell"),
      col("v").as("av"), col("nrm").as("anrm"))
    val b = cells.select(col("vid").as("b_id"), col("cell").as("b_cell"),
      col("v").as("bv"), col("nrm").as("bnrm"))
    val dropped = a.join(b,
        col("a_cell") === col("b_cell") && col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("av"), col("bv")) / (col("anrm") * col("bnrm")))
      .filter(col("sim") >= tau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("rep_id"))
    cells.select(col("vid").as("vec_id"), col("cell"))
      .join(dropped, col("vec_id") === col("b_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("rep_id").isNull.as("kept"), col("rep_id"))
  }

  /** LSH-bucketed ANN: `tables` independent `planes`-bit signatures; a
    * corpus vector is a candidate for a query if any table assigns both the
    * same bucket. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 1,
      planes: Int = 8,
      tables: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portableHash: Boolean = false
  ): DataFrame = {
    // One tiny metadata job: the plane matrix is materialized driver-side
    // (O(planes × dim) hash evals instead of per-row), which needs the fixed
    // vector dimensionality up front. min/max over BOTH inputs rather than
    // head-of-corpus: an empty corpus must return an empty result (not
    // NoSuchElementException), and a ragged vector column must fail loudly
    // (ArrayDot's min-length dot product would silently truncate the longer
    // vector into wrong signatures and buckets).
    val dims = corpus.select(size(col(vecCol)).as("d"))
      .union(queries.select(size(col(vecCol)).as("d")))
      .agg(min(col("d")).as("mn"), max(col("d")).as("mx")).head()
    // q_id takes the QUERIES id type, neighbor_id the CORPUS id type —
    // built from both inputs so the empty-path schema matches the
    // non-empty one even when the two id columns differ in type
    val emptySchema = queries.select(col(idCol).as("q_id")).limit(0)
      .crossJoin(corpus.select(col(idCol).as("neighbor_id")).limit(0))
      .withColumn("sim", lit(0.0)).withColumn("rank", lit(0))
    if (dims.isNullAt(0)) return emptySchema
    require(dims.getInt(0) == dims.getInt(1),
      s"lshTopK: vector column '$vecCol' has mixed dimensionality " +
        s"(${dims.getInt(0)}..${dims.getInt(1)}) across corpus+queries — " +
        "signatures over truncated vectors would be silently wrong")
    val dim = dims.getInt(0)
    def sigOf(v: org.apache.spark.sql.Column, salt: Int) =
      if (portableHash) portableHyperplaneSig(v, planes, dim, salt)
      else hyperplaneSig(v, planes, dim, salt)
    def bucketed(df: DataFrame, role: String) = {
      val base = withVec(df, idCol, vecCol)
      // One signature column per table, each over a DISJOINT plane set
      // (tableSalt = tb * planes), built as a literal array of row-level
      // expressions — each signature is evaluated once per row, never
      // re-evaluated per array element (the HOF lambda trap). The
      // tb * 2^planes offset keeps buckets from different tables disjoint
      // under the single (tbl, bucket) join key.
      val sigs = array((0 until tables).map(tb =>
        sigOf(col("v"), tb * planes) + lit(tb.toLong * (1L << planes))): _*)
      base.select(col("vid"), col("v"), col("nrm"), posexplode(sigs))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
        .withColumnRenamed("vid", s"${role}_vid")
    }
    val c = bucketed(corpus, "c")
    val q = bucketed(queries, "q")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    val cand = c.join(q,
      c("tbl") === q("tbl") && c("bucket") === q("bucket")
        && col("c_vid") =!= col("q_vid"))
      .select(col("q_vid").as("q_id"), col("c_vid").as("neighbor_id"),
        col("qv"), col("qnrm"), col("v"), col("nrm"))
      .dropDuplicates("q_id", "neighbor_id")
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), col("sim"), col("rn").cast("int").as("rank"))
      .drop("rn")
  }
}
