package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Loaders for the driver's star-schema testdata (`TESTDATA.md`): one parquet
  * per table under `dir`. Schema-on-read — no hardcoded schemas, so filters
  * and projections push into the parquet scan.
  */
object Tables {
  /** `events.ts` has shipped in two physical forms across driver testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]), so it must be read as a nanosecond
    * long (legacy knob) and floor-converted — and plain TIMESTAMP(MICROS),
    * which reads directly. Dispatch on the read type so either generation
    * loads; both paths are bit-identical to DuckDB's `CAST(ts AS TIMESTAMP)`
    * on the same column, which the oracle SQL uses. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TimestampNTZ;
        // the session timezone is pinned to UTC everywhere, so the cast is a
        // pure reinterpretation to the TimestampType the query family expects.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // Fail LOUD on a physical form we have never seen: a blanket cast
        // would turn e.g. a corrupt string generation into silent nulls
        // across the whole events query family.
        throw new IllegalStateException(
          s"events.ts read as unsupported type $other — teach Tables.events " +
            "the new physical form instead of casting blindly")
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
}

/** Exact-arithmetic helpers for oracle parity.
  *
  * Summing raw doubles is accumulation-order dependent, so Spark and the
  * DuckDB oracle could differ in the last ulps and fail the driver's hash
  * compare. All money-ish columns in the testdata are clean 2-decimal values
  * (verified at sf0.01), so casting to DECIMAL(18,2) is lossless and decimal
  * aggregation is exact — both engines then produce bit-identical doubles.
  * The oracle SQL mirrors each helper 1:1:
  *   dsum(c)  ≡ CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE)
  *   davg(c)  ≡ CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c)
  *   dmul(a,b)≡ CAST(a AS DECIMAL(18,2)) * (expr over DECIMAL)  — exact scale-4
  */
object Dec {
  val D2: DecimalType = DecimalType(18, 2)
  val D4: DecimalType = DecimalType(18, 4)

  def dec(c: Column): Column = c.cast(D2)
  def dsum(c: Column): Column = sum(c.cast(D2)).cast(DoubleType)
  def davg(c: Column): Column = sum(c.cast(D2)).cast(DoubleType) / count(c)
  /** price * (1 - discount) in exact decimal, as a scale-4 decimal. */
  def discPrice(price: Column, discount: Column): Column =
    (dec(price) * (lit(1) - dec(discount))).cast(D4)
}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle that the driver's
  * correctness harness replays over the same parquet tables. */
final case class GQ(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
