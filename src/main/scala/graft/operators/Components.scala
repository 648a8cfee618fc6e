package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that turns
  * pairwise near-duplicate hits (MinHash-LSH, SimHash, embedding pairs) into
  * duplicate CLUSTERS, so a corpus can keep one representative per group
  * instead of dropping both ends of every pair.
  *
  * Algorithm: iterative min-label propagation with path compression.
  * Each round does
  *   1. label(u) := min(label(u), min over neighbors v of label(v))  — one
  *      shuffle bounded by |E|;
  *   2. label(u) := label(label(u))  — pointer jumping against the label
  *      table itself, which collapses chains so convergence needs
  *      O(log(diameter)) rounds rather than O(diameter).
  * Rounds stop when no label changed. Lineage is truncated every round:
  * without it the plan doubles per iteration and Catalyst analysis time,
  * not the data, becomes the bottleneck. By default truncation uses
  * `localCheckpoint` (executor-local blocks — fast, but lost under
  * executor churn); pass `checkpointDir` to truncate via a durable parquet
  * round-trip instead (self-cleaning, round n-1 deleted once round n is
  * materialized) — the executable form of the cluster-robustness contract,
  * same labels either way.
  *
  * 100 TB shape: every round's cost is two key-bounded shuffles over the
  * edge list (|E| for dedup output is orders of magnitude below |corpus|),
  * and the label table is one row per vertex that APPEARS in an edge —
  * singleton documents never enter the computation.
  */
/** Per-round lineage truncation for the iterative-graph family — the shared
  * mechanism [[Components.connected]]/[[Graph.pageRank]] inline: without a
  * truncation the plan doubles per round and Catalyst analysis, not data,
  * becomes the bottleneck. `localCheckpoint` by default (executor-local
  * blocks); with a `checkpointDir`, a durable parquet round-trip that
  * deletes round n−1 as soon as round n is materialized, so on-disk
  * accumulation is O(|state|), not O(rounds·|state|). */
/** [[Truncator]] that also RELEASES the superseded round's checkpoint
  * blocks as soon as the next round materializes. In local-checkpoint
  * mode each round's blocks otherwise pin executor storage for the
  * session's lifetime until LRU pressure — the survivor-cache leak class
  * pareto3d closed in r15, factored here (r16) so every iterative
  * operator shares it instead of re-inlining the bookkeeping
  * (shortestPaths carried the only copy). Each materialized truncation
  * supersedes the previous one (the new checkpoint is self-contained),
  * so the release is safe by construction; the FINAL checkpoint — the
  * one backing the returned frame — is never released here. Durable
  * (checkpointDir) mode adds no cached blocks; the file-deletion
  * self-cleaning inside [[Truncator]] already covers it. */
private[operators] final class ReleasingTruncator(
    spark: org.apache.spark.sql.SparkSession,
    checkpointDir: Option[String],
    tag: String) {
  private val truncate = new Truncator(spark, checkpointDir, tag)
  private val prevCp = scala.collection.mutable.ListBuffer
    .empty[org.apache.spark.rdd.RDD[_]]
  def apply(df: DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = truncate(df) // eager in local mode; durable adds no blocks
    val added = (sc.getPersistentRDDs -- before).values
    prevCp.foreach(_.unpersist(false))
    prevCp.clear()
    prevCp ++= added
    out
  }
}

/** Convergence metering FUSED into the truncation action (guide §1.2/2.4:
  * the iterative family's per-round fixed cost is jobs, not bytes, at the
  * small-round end — and one job per round is pure probe overhead). The
  * "did anything change" aggregate rides the SAME job that materializes
  * the round — an `observe` metric collected while the checkpoint/write
  * executes — instead of a second filter+count job over the checkpointed
  * blocks. Results are identical: the metric is a sum over exactly the
  * rows the checkpoint wrote. Falls back to the plain count when the
  * metric does not arrive (listener delivery is asynchronous;
  * `drainListenerBus` makes the common path deterministic, the fallback
  * keeps the probe an instrument rather than a dependency). */
private[operators] object FusedProbe {
  import org.apache.spark.sql.Column
  /** Truncate `df` and return (truncated frame, count of rows where
    * `flag` is true) — one materializing job total. */
  def truncateCounting(
      truncate: ReleasingTruncator,
      df: DataFrame,
      flag: Column): (DataFrame, Long) = {
    val spark = df.sparkSession
    val probe = org.apache.spark.sql.Observation()
    val out = truncate(
      df.observe(probe, sum(when(flag, 1L).otherwise(0L)).as("n")))
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    val n = org.apache.spark.sql.GraftBridge.observedOrEmpty(probe)
        .get("n") match {
      case Some(v: Long) => v
      case Some(null) => 0L // sum over zero rows
      case _ => out.filter(flag).count()
    }
    (out, n)
  }
}

private[operators] final class Truncator(
    spark: org.apache.spark.sql.SparkSession,
    checkpointDir: Option[String],
    tag: String) {
  private val runDir = checkpointDir.map(d =>
    s"$d/graft-$tag-${java.util.UUID.randomUUID().toString.take(8)}")
  private var round = 0
  private var prevPath: Option[String] = None
  def apply(df: DataFrame): DataFrame = runDir match {
    case Some(base) =>
      val p = s"$base/round-$round"
      round += 1
      df.write.mode("overwrite").parquet(p)
      val back = spark.read.parquet(p)
      prevPath.foreach { old =>
        val path = new org.apache.hadoop.fs.Path(old)
        path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(path, true)
      }
      prevPath = Some(p)
      back
    case None => df.localCheckpoint(true)
  }
}

object Components {

  /** @param edges undirected edge list; (srcCol, dstCol) pairs, any
    *              integral type.
    * @param checkpointDir when set, per-round lineage truncation writes the
    *              label table as parquet under a per-call subdirectory of
    *              this path and reads it back (survives executor loss — the
    *              cluster mode). Each round's files are deleted as soon as
    *              the next round is materialized, so on-disk accumulation is
    *              O(|V|), not O(rounds·|V|); only the FINAL round's files
    *              remain (they back the returned DataFrame) — callers may
    *              delete the `graft-cc-*` subdirectory once the result is
    *              consumed. No SparkContext-global state is touched. When
    *              None, `localCheckpoint` (single-box / churn-free mode).
    * @return one row per vertex present in `edges`: (id, comp) where comp is
    *         the smallest vertex id reachable from id. */
  def connected(
      edges: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 30,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val spark = edges.sparkSession
    // Parquet write + read-back (Truncator's durable mode) is the analog
    // of df.checkpoint(eager = true): the write is an action (the round is
    // fully materialized), the read-back has zero lineage, and the
    // previous round's blocks — consumed entirely by this write — are
    // deleted immediately.
    val truncate = new ReleasingTruncator(spark, checkpointDir, "cc")
    val sym = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
    val und = sym.union(sym.select(col("v").as("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Seed with round 1 fused in: against identity labels the neighbor-min
    // is just min(v), so comp0 = min(u, min neighbor) costs one groupBy
    // instead of a full propagate+jump round.
    var labels = truncate(und.groupBy("u")
      .agg(least(col("u"), min(col("v"))).as("comp")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // r17 (guide §2.4): the neighbor-min aggregate and the left join
      // back onto the label table fold into ONE aggregation — each
      // vertex's own label rides the union as an origin-0 row, so
      // min(c) IS least(own, neighbor-min) and the own label (the `prev`
      // the convergence flag needs) is a conditional min in the same
      // shuffle. Vertices without neighbors keep their label via their
      // own row, exactly the old coalesce.
      val propagated = und
        .join(labels.select(col("u").as("v"), col("comp").as("vc")), "v")
        .select(col("u"), col("vc").as("c"), lit(1).as("o"))
        .unionByName(labels.select(col("u"), col("comp").as("c"),
          lit(0).as("o")))
        .groupBy("u")
        .agg(min(col("c")).as("comp"),
          min(when(col("o") === 0, col("c"))).as("prev"))
      // pointer jumping: follow the label one hop through the label table.
      // Convergence is detected with a carried `chg` flag summed INSIDE the
      // checkpoint job (FusedProbe) — no extra probe job per round.
      val jumped = propagated.as("l")
        .join(propagated.select(col("u").as("c0"), col("comp").as("cc")).as("m"),
          col("l.comp") === col("m.c0"), "left")
        .select(col("l.u").as("u"),
          coalesce(col("m.cc"), col("l.comp")).as("comp"),
          (coalesce(col("m.cc"), col("l.comp")) =!= col("l.prev")).as("chg"))
      val (next, nChanged) =
        FusedProbe.truncateCounting(truncate, jumped, col("chg"))
      changed = nChanged
      labels = next.drop("chg")
      it += 1
    }
    und.unpersist()
    require(changed == 0,
      s"Components.connected did not converge in $maxIter rounds")
    labels.select(col("u").as("id"), col("comp"))
  }

  /** Incremental connected components: fold an edge DELTA into STORED
    * labels without re-iterating over history — the d25/d37/e14/mv02
    * stored-artifact ingest contract applied to graphs. A daily dedup
    * job holds yesterday's duplicate-cluster labels; today's LSH pass
    * emits new pairs (new↔new, new↔old, and occasionally old↔old when a
    * threshold widens); re-running [[connected]] over the union re-pays
    * every historical round for a delta-sized change.
    *
    * Mechanism — contraction: [[connected]]'s labels are CANONICAL
    * (comp = min reachable id), so each stored component can stand in
    * for all its members. Delta endpoints map through the stored labels
    * (unseen vertices stand for themselves), [[connected]] runs on the
    * CONTRACTED delta — |Δ| edges, never |history| — and its output is a
    * root map over old labels; stored rows relabel through ONE left join
    * (comp → new root, linear, no iteration) and new vertices take their
    * contracted root directly. Because every stored label IS its
    * component's min id, the merged root is again the global min id —
    * the result is bit-identical to a from-scratch run over
    * history ∪ delta (the invariant the spec and the g05 oracle pin).
    *
    * Cost: the iterative part touches only the delta; history pays one
    * |V| relabel join. An empty or already-connected delta relabels
    * nothing. */
  def incremental(
      stored: DataFrame,
      newEdges: DataFrame,
      srcCol: String = "a_id",
      dstCol: String = "b_id",
      maxIter: Int = 30,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val lbl = stored.select(col("id").cast("long").as("id"),
      col("comp").cast("long").as("comp"))
    val e = newEdges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // contract endpoints through stored labels (AQE broadcasts the label
    // table when it fits; otherwise two key shuffles sized by the delta)
    val contracted = e
      .join(lbl.select(col("id").as("u"), col("comp").as("cu")), Seq("u"), "left")
      .join(lbl.select(col("id").as("v"), col("comp").as("cv")), Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("a_id"),
        coalesce(col("cv"), col("v")).as("b_id"))
      // persisted so the emptiness probe and connected()'s edge-table
      // materialization share one execution of the contraction joins
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (contracted.isEmpty) { contracted.unpersist(); return lbl }
    // roots of the delta-induced merge graph: (old label | new vertex) → min
    val roots = connected(contracted, "a_id", "b_id", maxIter, checkpointDir)
    contracted.unpersist() // roots is checkpoint-backed; nothing re-reads it
    val relabeled = lbl
      .join(roots.select(col("id").as("comp"), col("comp").as("_root")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("_root"), col("comp")).as("comp"))
    // Vertices first seen in the delta, read off the (checkpointed) root
    // map instead of a second pass over the delta edges (r16): every
    // contracted vertex is either a stored label — canonical min-member
    // ids, so `stored` always carries its (c, c) self-row — or an unseen
    // delta endpoint, and every contracted vertex appears in `roots`
    // (connected() labels each vertex of its edge list). The old
    // union+distinct+anti+left-join formulation re-derived the same set
    // from `e` with two extra exchanges.
    val fresh = roots.join(lbl.select(col("id")), Seq("id"), "left_anti")
    relabeled.unionByName(fresh)
  }
}
