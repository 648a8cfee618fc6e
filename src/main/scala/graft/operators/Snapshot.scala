package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-versioning diff between two corpus snapshots — the audit
  * report a curation pipeline emits per release: which documents were
  * added, removed, changed, or untouched.
  *
  * Shape: each side collapses to (id, fingerprint) at the scan (md5 of
  * the compared column — constant-width keys, so the exchange never
  * carries document bodies), then ONE full-outer sort-merge join on the
  * id. At 100 TB this is the canonical co-partitioned join: for a
  * recurring diff (every release, same id key), write both snapshots
  * bucketed on the id (`Bucketing.writeBucketed`) and the join plans
  * with zero Exchange nodes on either side.
  */
object Snapshot {

  /** Per-document diff status between snapshots `v1` and `v2`:
    * `removed` (in v1 only), `added` (in v2 only), `changed` (both,
    * fingerprints differ), `unchanged`. Output: (idCol, status). */
  def diff(
      v1: DataFrame,
      v2: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val a = v1.select(col(idCol).as("a_id"), md5(col(textCol)).as("a_fp"))
    val b = v2.select(col(idCol).as("b_id"), md5(col(textCol)).as("b_fp"))
    a.join(b, col("a_id") === col("b_id"), "full_outer")
      .select(
        coalesce(col("a_id"), col("b_id")).as(idCol),
        when(col("b_id").isNull, "removed")
          .when(col("a_id").isNull, "added")
          .when(col("a_fp") =!= col("b_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
