package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Disclosure-control primitives for PUBLISHING aggregates — the privacy
  * complement of [[Expectations]] (which gates what comes IN, this gates
  * what goes OUT). Reference tie-in: the reference pipelines end in a
  * sink that ships data to an external store (docs/usage.rst:285-295);
  * when the shipped rows are grouped statistics about people, small
  * groups re-identify their members, and the standard statistical-
  * disclosure-control remedy is small-cell suppression before release.
  */
object Privacy {

  /** k-anonymity small-cell suppression over an ALREADY-AGGREGATED
    * frame: every cell whose `countCol` is below `k` has all of its
    * `keyCols` replaced by `otherLabel` and is folded into one residual
    * row, so no published row describes fewer than `k` individuals while
    * corpus TOTALS are preserved exactly (nothing is dropped, only
    * coarsened). The residual row itself may hold fewer than `k` rows in
    * degenerate inputs — it is already non-identifying because every
    * identifying key is masked; callers who must also hide its existence
    * can filter it out (that trades total-preservation for stricter
    * suppression, a policy choice, not an engine one).
    *
    * Keys are cast to string (the label must be representable); measure
    * columns — every non-key column — are summed in their own type, so
    * keep them integral/decimal upstream: a DOUBLE measure would re-add
    * in partition order and lose the bit-exact replay guarantee every
    * published artifact in this engine carries.
    *
    * Scale shape: the input is an aggregate (cells, not rows — bounded
    * by key cardinality, not corpus size), masking is scan-local, and
    * the fold is a re-aggregation OF THE AGGREGATE: at 100 TB the
    * expensive pass is the upstream groupBy the caller already paid;
    * this adds one exchange over the cell table, which is KBs-to-MBs
    * whatever the corpus weighs. NULL keys mask like any other value
    * (they land in `otherLabel` when their cell is small — a NULL key
    * cell is still a cell someone could be singled out by).
    */
  def suppressSmallCells(
      aggregated: DataFrame,
      keyCols: Seq[String],
      countCol: String,
      k: Long,
      otherLabel: String = "__suppressed__"
  ): DataFrame = {
    require(keyCols.nonEmpty, "suppressSmallCells needs at least one key column")
    require(k >= 1, s"k must be positive, got $k")
    val missing = (keyCols :+ countCol).filterNot(aggregated.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    val measures = aggregated.columns.filterNot(keyCols.contains).toSeq
    val small = col(countCol) < lit(k)
    val masked = keyCols.foldLeft(aggregated) { (d, c) =>
      d.withColumn(c,
        when(small, lit(otherLabel)).otherwise(col(c).cast("string")))
    }
    masked.groupBy(keyCols.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
