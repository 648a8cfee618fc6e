package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-level co-location: write both sides of a recurring join bucketed
  * (and sorted) on the join keys, so the join plans as a zero-Exchange
  * sort-merge over pairwise-matching bucket files.
  *
  * The 100 TB rationale: a fact table bucketed ONCE on its join key
  * amortizes that shuffle across every downstream join/aggregate on the same
  * key — the Spark analog of a DISTRIBUTED BY layout in a warehouse engine,
  * and the strongest co-location tool when the dimension is too big to
  * broadcast. Requirements Spark imposes: equal bucket counts on both sides
  * and `spark.sql.sources.bucketing.enabled` (default true).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String]
  ): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket keys. With equal bucket
    * counts the planner reads matching buckets pairwise — no Exchange on
    * either side (BucketingSpec asserts the plan shape). */
  def cobucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
