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

  private[operators] def withVec(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))

  /** i-th length-`sd` subvector of an array column (1-based slice). */
  private[operators] def subVec(c: Column, i: Int, sd: Int) = slice(c, i * sd + 1, sd)

  /** Auto-sizing laws shared by the IVF family. Cells: ⌈√n⌉ keeps both the
    * centroid table (broadcast) and the per-cell row count sublinear.
    * Probes: ⌈3·√kCells⌉ keeps probed-candidate volume `probeN·n/kCells`
    * sublinear when kCells tracks √n; the 3× constant is calibrated on the
    * weakly-clustered synthetic corpus (IVF's adversarial case — see
    * [[ivfPqTopK]]'s inline notes for the measured sweep). */
  private[operators] def autoCellCount(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
  private[operators] def autoProbeCount(kCells: Int): Int =
    math.min(kCells, math.ceil(3.0 * math.sqrt(kCells.toDouble)).toInt)

  /** A fitted coarse quantizer (the IVF cell assignment), reusable across
    * [[ivfTopK]] / [[ivfPqTopK]] calls and sessions-worth of queries over
    * the same corpus: the fit is seeded and deterministic for a given
    * input, so reuse changes wall-clock, never results. Features are the
    * L2-normalized vectors as `fcoarse`; predictions land in `cluster`. */
  final case class CoarseFit(model: org.apache.spark.ml.clustering.KMeansModel) {
    def kCells: Int = model.clusterCenters.length
    def dim: Int = model.clusterCenters.head.size
  }

  /** Fitted per-subspace PQ codebooks, reusable across [[pqTopK]] /
    * [[ivfPqTopK]] (non-residual) calls over the same corpus — the verdict
    * of the r09 bench audit: two queries over one corpus must not pay two
    * identical seeded fits. For residual-mode IVFADC the codebooks are
    * defined relative to a coarse quantizer (they encode v̂ − centroid);
    * pass the pair that was fitted together. */
  final case class PqFit(
      models: IndexedSeq[org.apache.spark.ml.clustering.KMeansModel],
      m: Int, sd: Int, ks: Int)

  /** Fit the coarse quantizer alone: `nCentroids <= 0` auto-sizes to
    * ⌈√n⌉ cells. One persisted pass over the normalized corpus (KMeans
    * re-scans per iteration), released before returning. */
  def fitCoarseQuantizer(
      corpus: DataFrame,
      nCentroids: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): CoarseFit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = withVec(corpus, idCol, vecCol)
      .withColumn("vh", transform(col("v"), x => x / col("nrm")))
      .withColumn("fcoarse", array_to_vector(col("vh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    // fail LOUD here: an empty corpus would otherwise surface as mllib's
    // cryptic "parameter k given invalid value 1" from auto-sizing
    require(n > 0, "fitCoarseQuantizer: empty corpus — an IVF quantizer " +
      "cannot be fit on zero vectors (check the corpus filter/path)")
    val kCells =
      if (nCentroids > 0) nCentroids else autoCellCount(n)
    val model = new KMeans().setK(kCells).setSeed(42).setMaxIter(3)
      .setFeaturesCol("fcoarse").setPredictionCol("cluster").fit(base)
    base.unpersist(blocking = false)
    CoarseFit(model)
  }

  /** Fit PQ codebooks alone (the [[pqTopK]] / non-residual [[ivfPqTopK]]
    * training stage as a standalone artifact). `dim` is read from the
    * corpus and must split evenly into `m` subspaces. */
  def fitPqCodebooks(
      corpus: DataFrame,
      m: Int = 4,
      ks: Int = 16,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): PqFit = {
    val head = corpus.agg(min(size(col(vecCol))).as("mn"),
      max(size(col(vecCol))).as("mx")).head()
    require(!head.isNullAt(0), "fitPqCodebooks: empty corpus")
    require(head.getInt(0) == head.getInt(1),
      s"fitPqCodebooks: mixed dimensionality ${head.getInt(0)}..${head.getInt(1)}")
    val dim = head.getInt(0)
    require(dim % m == 0, s"fitPqCodebooks: dim $dim not divisible into $m subspaces")
    val sd = dim / m
    val n = withVec(corpus, idCol, vecCol)
      .withColumn("vh", transform(col("v"), x => x / col("nrm")))
    val trainBase =
      if (trainFraction < 1.0) n.sample(withReplacement = false, trainFraction, seed = 42)
      else n
    PqFit(fitCodebooks(trainBase, m, sd, ks), m, sd, ks)
  }

  /** Residual-mode codebooks for a GIVEN coarse quantizer: codebooks are
    * fitted on v̂ − centroid(assigned cell) — the Jégou §IV formulation.
    * The pair (coarse, result) is what residual [[ivfPqTopK]] and a stored
    * [[VectorIndex]] consume together; the codebooks are meaningless
    * without exactly this quantizer. */
  def fitResidualPqCodebooks(
      corpus: DataFrame,
      coarse: CoarseFit,
      m: Int = 4,
      ks: Int = 16,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): PqFit = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = coarse.dim
    require(dim % m == 0,
      s"fitResidualPqCodebooks: dim $dim not divisible into $m subspaces")
    val sd = dim / m
    val normalized = withVec(corpus, idCol, vecCol)
      .withColumn("vh", transform(col("v"), x => x / col("nrm")))
    val trainBase0 =
      if (trainFraction < 1.0)
        normalized.sample(withReplacement = false, trainFraction, seed = 42)
      else normalized
    val cents = coarse.model.clusterCenters.zipWithIndex
      .map { case (cv, i) => (i, cv.toArray.toSeq) }
      .toSeq.toDF("cluster", "cvec")
    val resTrain = coarse.model.transform(
      trainBase0.withColumn("fcoarse", array_to_vector(col("vh"))))
      .join(broadcast(cents), "cluster")
      .withColumn("vh", zip_with(col("vh"), col("cvec"), (a, b) => a - b))
    PqFit(fitCodebooks(resTrain, m, sd, ks), m, sd, ks)
  }

  private[operators] def checkPqFit(f: PqFit, m: Int, sd: Int, ks: Int): IndexedSeq[
      org.apache.spark.ml.clustering.KMeansModel] = {
    require(f.m == m && f.sd == sd && f.ks == ks,
      s"pre-fitted codebooks are (m=${f.m}, sd=${f.sd}, ks=${f.ks}); " +
        s"call-site wants (m=$m, sd=$sd, ks=$ks)")
    f.models
  }

  /** One seeded KMeans codebook per length-`sd` subspace, fitted over a
    * single cached scan of `trainBase` (must carry the L2-normalized `vh`).
    * The m fits are independent — submitted as CONCURRENT Spark jobs
    * (sequential fits pay m × the per-iteration job-scheduling latency;
    * measured 3× wall-clock on the m=8 bench query). Determinism is per-fit
    * (seeded), unaffected by completion order. Prediction columns are
    * `c_0..c_{m-1}` over feature columns `f_0..f_{m-1}`. */
  private def fitCodebooks(trainBase: DataFrame, m: Int, sd: Int, ks: Int)
      : IndexedSeq[org.apache.spark.ml.clustering.KMeansModel] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = (0 until m).foldLeft(trainBase) { (df, i) =>
      df.withColumn(s"f_$i", array_to_vector(subVec(col("vh"), i, sd)))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    models
  }

  /** Append `codes` (per-subspace centroid ids) to a frame carrying `vh`:
    * m chained KMeans assignments, fused into one scan by Catalyst. */
  private[operators] def encodeWith(
      models: IndexedSeq[org.apache.spark.ml.clustering.KMeansModel],
      df: DataFrame, m: Int, sd: Int): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val withFeatures = (0 until m).foldLeft(df) { (d, i) =>
      d.withColumn(s"f_$i", array_to_vector(subVec(col("vh"), i, sd)))
    }
    models.foldLeft(withFeatures) { (d, mod) => mod.transform(d) }
      .withColumn("codes", array((0 until m).map(i => col(s"c_$i")): _*))
  }

  /** Per-query ADC table over a query column `qcol`:
    * dtab[i][j] = ‖C[i][j]‖² − 2·qᵢ·C[i][j] — rank-equivalent to
    * ‖qᵢ − C[i][j]‖² up to the per-row constant ‖q‖² (cosine-faithful on
    * normalized vectors; residual callers that rank ACROSS tables must add
    * ‖q‖² back, see [[ivfPqTopK]]). One native dot per
    * (subspace, centroid). */
  private def adcTable(
      models: IndexedSeq[org.apache.spark.ml.clustering.KMeansModel],
      sd: Int, qcol: Column = col("qvh")): Column =
    adcTableFrom(
      models.map(_.clusterCenters.toIndexedSeq.map(_.toArray)), sd, qcol)

  /** [[adcTable]] from raw per-subspace center arrays — the form a STORED
    * index reconstitutes its codebooks in (no KMeansModel round-trip). */
  private[operators] def adcTableFrom(
      centers: IndexedSeq[IndexedSeq[Array[Double]]],
      sd: Int, qcol: Column): Column =
    array(centers.zipWithIndex.map { case (cbook, i) =>
      array(cbook.map { c =>
        lit(c.map(x => x * x).sum) -
          lit(2.0) * dot(subVec(qcol, i, sd), lit(c))
      }: _*)
    }: _*)

  /** ADC distance of a `codes` row against a `dtab` table: m lookups + adds,
    * no full-width arithmetic. */
  private[operators] def adcDist(m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, i) => acc +
        element_at(element_at(col("dtab"), i + 1),
          element_at(col("codes"), i + 1) + 1))

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
    * `c` and `q` — e.g. `col("c.label") === col("q.label")`.
    *
    * Like [[bruteForceTopK]], the QUERIES side must be small: it is
    * broadcast in full (vectors included) so the corpus side streams
    * without a shuffle. A corpus-sized `queries` input belongs in the
    * bucketed paths ([[lshTopK]] / [[ivfPqTopK]]), not here. */
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
    * and the (tiny) centroid table broadcasts.
    *
    * `nCentroids <= 0` sizes cells from the data: ceil(√n) centroids — the
    * standard IVF balance point (cell size ≈ √n, so per-query probe work ≈
    * nProbe·√n) — so a pinned constant can't silently mis-size cells as
    * the corpus grows. `nProbe <= 0` composes: ⌈3·√kCells⌉ probes (the
    * shared auto law), so auto-k at a new scale scales the probe count too
    * instead of silently losing recall against more, smaller cells.
    * Pass `coarseFitted` (from [[fitCoarseQuantizer]]) to reuse a
    * quantizer across calls/operators — seeded fits are deterministic, so
    * reuse changes wall-clock, never results. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 3,
      nCentroids: Int = 16,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      coarseFitted: Option[CoarseFit] = None
  ): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    // Fit (one persisted pass, released inside) or reuse a caller-supplied
    // quantizer — the seeded fit is deterministic, so reuse changes
    // wall-clock only. nCentroids is read from the supplied model's k when
    // pre-fitted.
    val fit = coarseFitted.getOrElse(
      fitCoarseQuantizer(corpus, nCentroids, idCol, vecCol))
    val kCells = fit.kCells
    // nProbe <= 0 → the shared ⌈3·√kCells⌉ auto law (capped at kCells):
    // composes with auto-k so turning on nCentroids <= 0 at a new scale
    // scales the probe count too, instead of silently losing recall.
    val probeN = if (nProbe > 0) nProbe else autoProbeCount(kCells)
    val normalized = withVec(corpus, idCol, vecCol)
      .withColumn("vh", transform(col("v"), x => x / col("nrm")))
    val assigned = fit.model.transform(
      normalized.withColumn("fcoarse", array_to_vector(col("vh"))))
      .select(col("vid"), col("vh"), col("cluster"))
    import spark.implicits._
    val centroids = fit.model.clusterCenters.zipWithIndex
      .map { case (cv, i) =>
        (i, cv.toArray.toSeq, cv.toArray.map(x => x * x).sum) }
      .toSeq.toDF("cluster", "cvec", "cnorm2")
    val q = withVec(queries, idCol, vecCol)
      .withColumn("qvh", transform(col("v"), x => x / col("nrm")))
      .select(col("vid").as("q_id"), col("qvh"))
    // probeN nearest cells per query, by the assignment metric: Euclidean
    // distance between the normalized query and the centroid (the constant
    // ‖q̂‖² = 1 term drops out of the ranking). Centroid table broadcast.
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cdist"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        col("cnorm2") - lit(2.0) * dot(col("qvh"), col("cvec")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= probeN)
      .select(col("q_id"), col("qvh"), col("cluster"))
    val cand = probes.join(assigned, "cluster")
      .filter(col("vid") =!= col("q_id"))
      .withColumn("sim", dot(col("qvh"), col("vh")))
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
    * keeps the best `max(k·refine, shortlistC·√n)` rows per query by ADC
    * and re-ranks that shortlist with exact cosine (the standard two-stage
    * PQ design). The √n floor — NOT a corpus fraction — absorbs the
    * recall decay of a constant shortlist as the flat ADC scan grows
    * (recall@3 measured 0.83 → 0.51 going 500 → 5000 vectors with a fixed
    * 24-row shortlist) while keeping the exact pass sublinear in the
    * corpus. When even √n per query is too much, compose the cells with
    * the codes instead: [[ivfPqTopK]] bounds candidates by probed cell and
    * keeps the shortlist CONSTANT. */
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
      shortlistC: Double = 3.0,
      fitted: Option[PqFit] = None
  ): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
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

    // ---- train: one seeded KMeans per subspace, all over one cached scan
    // — or a caller-supplied fit (deterministic seeded fits ⇒ same output)
    val models = fitted.map(checkPqFit(_, m, sd, ks)).getOrElse {
      val trainBase = {
        val n = normalized(corpus)
        if (trainFraction < 1.0) n.sample(withReplacement = false, trainFraction, seed = 42)
        else n
      }
      fitCodebooks(trainBase, m, sd, ks)
    }

    // ---- encode the corpus: m chained assignments, fused into one scan
    val encoded = encodeWith(models, normalized(corpus), m, sd)
      .select(col("vid"), col("codes"))

    // ---- per-query ADC table, broadcast with the queries
    val q = normalized(queries).select(col("vid").as("q_id"), col("vh").as("qvh"))
    val qt = q.withColumn("dtab", adcTable(models, sd)).select("q_id", "qvh", "dtab")

    // ---- ADC scan: m lookups + adds per (corpus row, query); queries
    // (with their tables) broadcast, the corpus side never re-touches floats
    val scored = encoded.join(broadcast(qt), col("vid") =!= col("q_id"))
      .withColumn("adist", adcDist(m))
    // Shortlist size: k·refine, FLOORED at shortlistC·√n. A fixed
    // multiplier tuned at one scale silently decays as the corpus grows
    // (recall@3 measured 0.83 → 0.51 going 500 → 5000 vectors with a
    // constant 24-row shortlist), and the floor must also absorb
    // per-session codebook jitter (KMeans init samples depend on input
    // partitioning): a 100-row shortlist at 5000 vectors straddled the 0.6
    // oracle bar across sessions (0.59–0.81); 200+ holds it clear. The √n
    // law gives 67 at 500 / 212 at 5000 / ~95k at 10⁹ — sublinear, unlike
    // the corpus-fraction floor it replaces (which was 4×10⁷ at 10⁹,
    // defeating PQ's point).
    val shortlistN = math.max(k.toLong * refine,
      math.ceil(shortlistC * math.sqrt(cs.getLong(2).toDouble)).toLong)
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

  /** IVFADC — IVF cells composed with PQ codes (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search", §IV): a coarse
    * spherical-KMeans quantizer bounds each query's candidate set to its
    * `nProbe` nearest cells, ADC ranks the candidates by their m-byte
    * codes, a CONSTANT `k·refine` shortlist re-ranks with exact cosine.
    *
    * This is the scale composition of [[ivfTopK]] (which ranks probed
    * cells with full-width dots) and [[pqTopK]] (whose flat ADC scan needs
    * a √n shortlist floor to hold recall): candidates per query are
    * `nProbe·(n/nCentroids)` rows of m codes, and the exact pass touches
    * `k·refine` vectors regardless of corpus size — per-query work is
    * sublinear end to end once `nCentroids` tracks √n. The corpus never
    * shuffles: probed (query, cell) rows carry their ADC tables and
    * broadcast onto the code scan as a broadcast hash join on the cell id.
    *
    * With `residual = true` (default, the actual Jégou §IV formulation)
    * the codebooks quantize residuals r = v̂ − centroid(cell) rather than
    * v̂ directly: on CLUSTERED data residual magnitudes are much smaller
    * than vector magnitudes, so the same m·log2(ks) bits spend their
    * resolution where candidates actually differ. On weakly-clustered data
    * the gain vanishes (measured on the near-uniform synthetic corpus:
    * residual 0.660 vs direct 0.680 at sf0.1, same params — residuals are
    * as large as the vectors themselves there, and one codebook pooled
    * over all cells' residuals quantizes no better). The cost is
    * per-(query, probed cell) ADC tables — nProbe·m·ks dots per query
    * instead of m·ks — still a per-query CONSTANT, and the coarse fit must
    * complete before codebook training (they fit concurrently in
    * non-residual mode). Cross-cell ranking adds the per-probe constant
    * ‖q̂ − c‖² back to the table distances: without it, ADC distances from
    * different cells' tables are not comparable and the shortlist skews
    * toward far cells.
    *
    * `nCentroids <= 0` auto-sizes to ceil(√n) cells (see [[ivfTopK]]);
    * `nProbe <= 0` and `refine <= 0` similarly auto-size from cardinality
    * (see the inline laws) — the mode for corpora whose scale isn't known
    * at call-site authoring time. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 3,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      ks: Int = 16,
      refine: Int = 8,
      trainFraction: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      residual: Boolean = true,
      coarseFitted: Option[CoarseFit] = None,
      fitted: Option[PqFit] = None
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    require(!(residual && fitted.isDefined && coarseFitted.isEmpty),
      "residual codebooks encode v̂ − centroid and are meaningless without " +
        "the coarse quantizer they were fitted against — pass both")
    // same guards as pqTopK: empty corpus/queries → empty typed result
    // BEFORE KMeans is asked to fit nothing; ragged dims fail loudly
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
      s"ivfPqTopK: vector column '$vecCol' has mixed dimensionality " +
        s"(corpus ${cs.getInt(0)}..${cs.getInt(1)}, " +
        s"queries ${qs.getInt(0)}..${qs.getInt(1)})")
    val dim = cs.getInt(0)
    require(dim % m == 0, s"ivfPqTopK: dim $dim not divisible into $m subspaces")
    val sd = dim / m

    def normalized(df: DataFrame) = withVec(df, idCol, vecCol)
      .withColumn("vh", transform(col("v"), x => x / col("nrm")))

    // The normalized corpus feeds TWO passes — the encode scan and the
    // exact re-rank's vector lookup — so the narrow (vid, vh) projection
    // persists for the call's duration (session-cache contract): one
    // parquet scan + normalize instead of two (r16).
    val normCorpus = normalized(corpus).select(col("vid"), col("vh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- train: coarse quantizer + per-subspace codebooks over ONE cached
    // scan of the normalized corpus (the coarse fit re-scans per iteration,
    // the m codebook fits run concurrently on top). When BOTH fits arrive
    // pre-computed the training base never materializes at all — `baseUsed`
    // gates the persist/unpersist pair.
    var baseUsed = false
    lazy val base = {
      baseUsed = true
      normalized(corpus)
        .withColumn("fcoarse", array_to_vector(col("vh")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def trainBase =
      if (trainFraction < 1.0)
        base.sample(withReplacement = false, trainFraction, seed = 42)
      else base
    // nCentroids <= 0 → ceil(√n) cells (same auto-sizing as ivfTopK); the
    // corpus count is already on hand from the dimensionality guard. A
    // pre-fitted quantizer brings its own k.
    val nCorpus = cs.getLong(2)
    val kCells = coarseFitted.map(_.kCells).getOrElse(
      if (nCentroids > 0) nCentroids else autoCellCount(nCorpus))
    // nProbe <= 0 → ceil(3·√kCells), capped at kCells. The √kCells shape
    // keeps probed-candidate count (nProbe·n/kCells) sublinear when kCells
    // tracks √n; the 3× constant is calibrated on the weakly-clustered
    // synthetic corpus (the ADVERSARIAL case for IVF — measured: 1·√kCells
    // probes 9/71 cells at n=5000 for recall 0.59, 3·√kCells probes 24 for
    // 0.86). Clustered real corpora hold recall at lower multiples — pin
    // nProbe explicitly there; auto mode buys scale-safety, not optimality.
    val probeN = if (nProbe > 0) nProbe else autoProbeCount(kCells)
    // refine <= 0 → shortlist floored at 3·√n exact re-ranks per query
    // (pinned refine keeps the constant-work contract; auto mode accepts
    // the same 3√n law as pqTopK because ADC precision on weakly-clustered
    // data decays with candidate count — measured at n=5000: shortlist 72
    // → 0.74 recall even probing ALL cells, 144 → 0.87; the 3× constant
    // holds auto mode within 0.05 of the sweep-tuned pinned recall at both
    // verification scales).
    val shortlistN =
      if (refine > 0) k.toLong * refine
      else math.max(8L * k, math.ceil(3.0 * math.sqrt(nCorpus.toDouble)).toLong)
    // the coarse fit is independent of the m codebook fits in NON-residual
    // mode — run it as a concurrent Spark job alongside them (same pattern
    // and determinism argument as fitCodebooks; the per-iteration
    // scheduling latency of a small-k fit otherwise adds straight
    // wall-clock). Residual mode trains codebooks ON the coarse residuals,
    // so the coarse fit must complete first; the m codebook fits still run
    // concurrently among themselves inside fitCodebooks.
    val preModels = fitted.map(checkPqFit(_, m, sd, ks))
    val (coarse, models) =
      if (residual) {
        val c = coarseFitted.map(_.model).getOrElse(
          new KMeans().setK(kCells).setSeed(42).setMaxIter(3)
            .setFeaturesCol("fcoarse").setPredictionCol("cluster").fit(base))
        val ms = preModels.getOrElse {
          val cents = c.clusterCenters.zipWithIndex
            .map { case (cv, i) => (i, cv.toArray.toSeq) }
            .toSeq.toDF("cluster", "cvec")
          // residual train base: vh := v̂ − centroid(assigned cell); the
          // centroid lookup is a broadcast join on the cell id, so auto-√n
          // cell counts never become a giant literal in the plan
          val resTrain = c.transform(trainBase)
            .join(broadcast(cents), "cluster")
            .withColumn("vh", zip_with(col("vh"), col("cvec"), (a, b) => a - b))
          fitCodebooks(resTrain, m, sd, ks)
        }
        (c, ms)
      } else (coarseFitted.map(_.model), preModels) match {
        case (Some(c), Some(ms)) => (c, ms)
        case (Some(c), None) => (c, fitCodebooks(trainBase, m, sd, ks))
        case (None, Some(ms)) =>
          (new KMeans().setK(kCells).setSeed(42).setMaxIter(3)
            .setFeaturesCol("fcoarse").setPredictionCol("cluster").fit(base), ms)
        case (None, None) =>
          val coarseF = {
            import scala.concurrent.Future
            import scala.concurrent.ExecutionContext.Implicits.global
            Future {
              new KMeans().setK(kCells).setSeed(42).setMaxIter(3)
                .setFeaturesCol("fcoarse").setPredictionCol("cluster").fit(base)
            }
          }
          val ms = fitCodebooks(trainBase, m, sd, ks)
          val c = {
            import scala.concurrent.Await
            import scala.concurrent.duration.Duration
            Await.result(coarseF, Duration.Inf)
          }
          (c, ms)
      }
    // fit-only cache, released eagerly (the ivfTopK contract): the single
    // downstream encode pass recomputes from lineage
    if (baseUsed) base.unpersist(blocking = false)

    val centroids = coarse.clusterCenters.zipWithIndex
      .map { case (cv, i) =>
        (i, cv.toArray.toSeq, cv.toArray.map(x => x * x).sum) }
      .toSeq.toDF("cluster", "cvec", "cnorm2")

    // ---- encode: cell id + m codes per corpus vector, one fused scan
    // (residual mode re-points `vh` at v̂ − centroid before coding)
    val assigned = coarse.transform(normCorpus
      .withColumn("fcoarse", array_to_vector(col("vh"))))
    val codeInput =
      if (residual)
        assigned.join(broadcast(centroids.select("cluster", "cvec")), "cluster")
          .withColumn("vh", zip_with(col("vh"), col("cvec"), (a, b) => a - b))
      else assigned
    val encoded = encodeWith(models, codeInput, m, sd)
      .select(col("vid"), col("cluster"), col("codes"))

    // ---- probe: nProbe nearest cells per query by the assignment metric
    // (‖q̂‖² constant → rank by ‖c‖² − 2·q̂·c); each probe row carries its
    // ADC table so the candidate join needs nothing else. Non-residual:
    // ONE table per query. Residual: one table per (query, probed cell)
    // over the residual query q̂ − c, built AFTER the nProbe filter so only
    // probed cells pay the nProbe·m·ks dots, plus the ‖q̂ − c‖² constant
    // (`qc2`) that makes distances comparable across cells' tables.
    val qt = normalized(queries)
      .select(col("vid").as("q_id"), col("vh").as("qvh"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cdist"), col("cluster"))
    val probed = qt.crossJoin(broadcast(centroids))
      .withColumn("cdist", col("cnorm2") - lit(2.0) * dot(col("qvh"), col("cvec")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= probeN)
    val probes =
      if (residual)
        probed
          .withColumn("rqvh", zip_with(col("qvh"), col("cvec"), (a, b) => a - b))
          .withColumn("dtab", adcTable(models, sd, col("rqvh")))
          .withColumn("qc2", dot(col("rqvh"), col("rqvh")))
          .select(col("q_id"), col("qvh"), col("dtab"), col("qc2"), col("cluster"))
      else probed
        .withColumn("dtab", adcTable(models, sd))
        .withColumn("qc2", lit(0.0))
        .select(col("q_id"), col("qvh"), col("dtab"), col("qc2"), col("cluster"))

    // ---- candidates: code scan × broadcast probes, equi-join on the cell
    // id — the corpus side never shuffles and never re-touches floats
    val cand = encoded.join(broadcast(probes), Seq("cluster"))
      .filter(col("vid") =!= col("q_id"))
      .withColumn("adist", col("qc2") + adcDist(m))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("vid"))
    val shortlist = cand
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= shortlistN)
      .select(col("q_id"), col("qvh"), col("vid"))

    // ---- exact re-rank: shortlistN exact cosines per query — a constant
    // k·refine when refine is pinned (corpus-size independent, the
    // difference from pqTopK), 2·√n under auto mode
    val cvecs = normCorpus
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
    * decision needs no global state beyond the per-cell neighborhood.
    *
    * Cache contract (same as the `Dedup` pair-finders): the cell table is
    * persisted because the returned lazy plan reads it from both sides of
    * the within-cell self-join plus the final decision select. The entry
    * lives until the session drops it — long-lived sessions issuing many
    * calls should `spark.catalog.clearCache()` between corpora (the bench
    * and verify harnesses do). */
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

  /** Coverage-capped diversity sampling over the embedding space: partition
    * vectors into deterministic hyperplane cells (the [[semDedup]] code) and
    * keep at most `cap` per cell — the cheap way to force a sample to SPAN
    * the embedding space instead of following its density (dense regions
    * are truncated at `cap`, sparse regions survive whole). The complement
    * of [[semDedup]]: that prunes near-identical neighbors, this bounds
    * how much any one region contributes to a training mix.
    *
    * Within a cell the kept set is the `cap` smallest ids — deterministic
    * across engines, re-runs and task retries; swap the ordering for a
    * portable id-hash when unbiased within-cell choice matters (the cell
    * cap, not the within-cell order, is what buys the diversity).
    *
    * 100 TB shape: one shuffle on the cell code; the rank-1..cap window is
    * WindowGroupLimit-pruned to `cap` rows per cell per map task, so a
    * degenerate cell holding half the corpus never sorts in one task. */
  def cellCapSample(
      vecs: DataFrame,
      cap: Int,
      planes: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portableHash: Boolean = false
  ): DataFrame = {
    require(cap >= 1, s"cellCapSample: cap must be >= 1, got $cap")
    val dims = vecs.select(size(col(vecCol)).as("d"))
      .agg(min(col("d")).as("mn"), max(col("d")).as("mx")).head()
    val emptySchema = vecs.select(col(idCol).as("vec_id"), lit(0L).as("cell"))
      .limit(0)
    if (dims.isNullAt(0)) return emptySchema
    require(dims.getInt(0) == dims.getInt(1),
      s"cellCapSample: vector column '$vecCol' has mixed dimensionality " +
        s"(${dims.getInt(0)}..${dims.getInt(1)})")
    val dim = dims.getInt(0)
    val sig =
      if (portableHash) portableHyperplaneSig(col("v"), planes, dim, 0)
      else hyperplaneSig(col("v"), planes, dim, 0)
    val w = Window.partitionBy("cell").orderBy(col("vec_id"))
    withVec(vecs, idCol, vecCol)
      .select(col("vid").as("vec_id"), col("v"))
      .withColumn("cell", sig)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("vec_id"), col("cell"))
  }

  /** LSH-bucketed ANN: `tables` independent `planes`-bit signatures; a
    * corpus vector is a candidate for a query if any table assigns both the
    * same bucket.
    *
    * `multiProbe` (Lv et al. 2007, "Multi-Probe LSH"): each QUERY
    * additionally probes every Hamming-1 neighbor of its bucket — the
    * `planes` one-bit flips — so near-misses split by a single hyperplane
    * are recovered without another table. The index (corpus) side is
    * untouched: this buys table-count recall with per-query candidate
    * volume (×(planes+1) probes) instead of ×tables index size — at
    * 100 TB the corpus-side explode is the cost that matters, so
    * multi-probe is the first recall lever, extra tables the second.
    *
    * `probeBudget` (with `multiProbe`): probe only the `probeBudget`
    * one-bit flips with the SMALLEST margin |q·plane_p| — the planes the
    * query sits closest to, i.e. the flips most likely to hide a true
    * neighbor (the success probability of flip p decays with the margin,
    * Lv et al. §3.1). A budget of planes/2 keeps most of the full
    * Hamming-1 recall at roughly half the probe volume — the lever when
    * per-query candidate cost matters more than the last recall points.
    * `<= 0` or `>= planes` means all flips (plain multi-probe). Margins
    * come from the same ArrayDot fold as the signature bits, so the
    * ordering and the bucket assignment never disagree (and the DuckDB
    * oracle replays both). */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 1,
      planes: Int = 8,
      tables: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      portableHash: Boolean = false,
      multiProbe: Boolean = false,
      probeBudget: Int = 0
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
    def dotsOf(v: org.apache.spark.sql.Column, salt: Int) =
      if (portableHash) portablePlaneDots(v, planes, dim, salt)
      else planeDots(v, planes, dim, salt)
    val marginMode = multiProbe && probeBudget >= 1 && probeBudget < planes
    def bucketed(df: DataFrame, role: String, probe: Boolean) = {
      val base = withVec(df, idCol, vecCol)
      val out =
        if (probe && marginMode) {
          // Margin-ordered probing is data-dependent, so signatures and
          // margin arrays are materialized as NAMED columns first: the
          // flip-building lambdas below then reference cheap attributes,
          // and CollapseProject keeps the boundary (the aliases are
          // multiply-referenced and non-trivial), so no signature fold is
          // re-evaluated per array element (the HOF lambda trap).
          val withSig = base.select(
            col("vid") +: col("v") +: col("nrm") +:
              (0 until tables).flatMap(tb => Seq(
                sigOf(col("v"), tb * planes).as(s"sig_$tb"),
                dotsOf(col("v"), tb * planes).as(s"dots_$tb"))): _*)
          val perTable = (0 until tables).map { tb =>
            val s = col(s"sig_$tb")
            val offset = lit(tb.toLong * (1L << planes))
            // rank planes by |margin| asc (ties by plane index — both
            // engines sort the (m, p) struct lexicographically), keep the
            // probeBudget closest, flip each bit onto the exact bucket
            val ranked = slice(
              sort_array(zip_with(
                col(s"dots_$tb"), sequence(lit(0), lit(planes - 1)),
                (d, p) => struct(abs(d).as("m"), p.as("p")))),
              1, probeBudget)
            val flips = transform(ranked, t =>
              struct(lit(tb).as("t"),
                (s.bitwiseXOR(
                  call_function("shiftleft", lit(1L), t.getField("p")))
                  + offset).as("b")))
            concat(array(struct(lit(tb).as("t"), (s + offset).as("b"))), flips)
          }
          withSig.select(col("vid"), col("v"), col("nrm"),
            explode(concat(perTable: _*)).as("tb"))
        } else {
          // One signature column per table, each over a DISJOINT plane set
          // (tableSalt = tb * planes), built as a literal array of row-level
          // expressions — each signature is evaluated once per row, never
          // re-evaluated per array element (the HOF lambda trap). The
          // tb * 2^planes offset keeps buckets from different tables disjoint
          // under the single (tbl, bucket) join key. With `probe`, each table
          // contributes the bucket itself plus its `planes` one-bit flips
          // (query side only — the index side always stays one row per table).
          val buckets = (0 until tables).flatMap { tb =>
            val s = sigOf(col("v"), tb * planes)
            val variants = if (probe) -1 until planes else -1 until 0
            variants.map { p =>
              val flipped = if (p < 0) s else s.bitwiseXOR(lit(1L << p))
              struct(lit(tb).as("t"),
                (flipped + lit(tb.toLong * (1L << planes))).as("b"))
            }
          }
          base.select(col("vid"), col("v"), col("nrm"),
            explode(array(buckets: _*)).as("tb"))
        }
      out.select(col("vid").as(s"${role}_vid"), col("v"), col("nrm"),
        col("tb.t").as("tbl"), col("tb.b").as("bucket"))
    }
    val c = bucketed(corpus, "c", probe = false)
    val q = bucketed(queries, "q", probe = multiProbe)
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
  }
}
