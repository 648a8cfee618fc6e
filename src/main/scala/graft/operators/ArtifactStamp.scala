package graft.operators

import org.apache.spark.sql.SparkSession

/** Generation-stamp discipline for MULTI-DIRECTORY derived artifacts —
  * [[FileManifest]]'s table↔manifest stamp pair generalized to any set of
  * directories that must describe the SAME build: a closure store's
  * (postings, edges, closure) triple, an evaluation artifact's
  * (ground-truth, signatures) pair. One build writes every directory and
  * then stamps them all with a single fresh generation id; every read
  * path verifies the stamps are present and EQUAL and fails loud
  * otherwise — the state a crash between the component writes (or a
  * partial rebuild of one component) leaves behind. Without the check, a
  * torn store silently joins yesterday's closure against today's edges
  * and produces a plausible wrong answer; with it, the failure names the
  * fix (rebuild).
  *
  * The stamp file itself is [[FileManifest]]'s `_graft_generation`
  * (create-then-rename publication, underscore-invisible to parquet
  * scans), so artifact stores and table manifests share one mechanism.
  * Stamps go on AFTER all data writes: any interruption leaves at least
  * one directory stampless or on the old generation, both of which
  * [[verifyAligned]] rejects.
  */
object ArtifactStamp {

  /** Stamp every directory with one fresh generation id (call AFTER all
    * the data writes); returns the id. */
  def stampAll(spark: SparkSession, dirs: Seq[String]): String = {
    require(dirs.nonEmpty, "stampAll: dirs must be non-empty")
    val gen = java.util.UUID.randomUUID().toString
    dirs.foreach(FileManifest.writeStamp(spark, _, gen))
    gen
  }

  /** Fail loud unless every directory carries the SAME generation stamp —
    * absent or mismatched stamps mean a torn or stale build. `what` names
    * the artifact in the error so the operator of a failed job knows
    * which store to rebuild. */
  def verifyAligned(spark: SparkSession, what: String, dirs: Seq[String]): Unit = {
    require(dirs.nonEmpty, "verifyAligned: dirs must be non-empty")
    val stamps = dirs.map(d => d -> FileManifest.readStamp(spark, d))
    val distinct = stamps.map(_._2).distinct
    if (distinct.size != 1 || distinct.head.isEmpty)
      throw new IllegalStateException(
        s"$what artifact is torn or stale: generation stamps " +
          stamps.map { case (d, g) => s"$d=${g.getOrElse("<none>")}" }
            .mkString(", ") +
          " — a build crashed between component writes or one component " +
          "was rebuilt alone; rebuild the whole artifact")
  }
}
