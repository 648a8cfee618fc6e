package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val HOUR = 3600L * 1000000L

  test("gaps materialize with n_events=0 and the previous value carried forward") {
    // user A: events at hour 0 (v=1.0) and hour 3 (v=4.0) → grid 0..3,
    // hours 1 and 2 are gaps carrying 1.0
    val df = Seq(
      ("A", ts("2024-01-01 00:10:00"), 1L, 1.0),
      ("A", ts("2024-01-01 03:05:00"), 2L, 4.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.gapFillLocf(df, "user_id", "ts", "event_id", "value", HOUR)
      .orderBy("bucket_ts")
      .select("n_events", "value_locf").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0), (0L, 1.0), (0L, 1.0), (1L, 4.0)))
  }

  test("grid spans each key's own [min, max] — nothing invented outside it") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1L, 1.0),
      ("A", ts("2024-01-01 05:00:00"), 2L, 2.0),
      ("B", ts("2024-01-01 02:00:00"), 3L, 9.0) // single event → 1 row
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.gapFillLocf(df, "user_id", "ts", "event_id", "value", HOUR)
    assert(out.filter($"user_id" === "A").count() == 6)
    assert(out.filter($"user_id" === "B").count() == 1)
  }

  test("within a bucket the LAST observation by (ts, id) wins, ties on ts by id") {
    val df = Seq(
      ("A", ts("2024-01-01 00:10:00"), 1L, 1.0),
      ("A", ts("2024-01-01 00:50:00"), 2L, 5.0), // latest ts in bucket
      ("A", ts("2024-01-01 00:50:00"), 3L, 7.0)  // same ts, larger id → wins
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.gapFillLocf(df, "user_id", "ts", "event_id", "value", HOUR)
      .select("n_events", "value_locf").as[(Long, Double)].head()
    assert(out == ((3L, 7.0)))
  }

  test("null observed values do not overwrite the carried value") {
    // LOCF's ignoreNulls: a bucket whose last observation has a null value
    // leaves the carried value intact (the standard pandas ffill contract)
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1L, Some(1.0)),
      ("A", ts("2024-01-01 01:00:00"), 2L, None: Option[Double]),
      ("A", ts("2024-01-01 02:00:00"), 3L, Some(3.0))
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.gapFillLocf(df, "user_id", "ts", "event_id", "value", HOUR)
      .orderBy("bucket_ts").select("value_locf").as[Double].collect().toSeq
    assert(out == Seq(1.0, 1.0, 3.0))
  }

  test("plan has no third exchange: the LOCF window reuses the groupBy partitioning") {
    val df = Seq(("A", ts("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val plan = Resample.gapFillLocf(df, "user_id", "ts", "event_id", "value", HOUR)
      .queryExecution.executedPlan.toString
    // two aggregation exchanges only (cells, perKey); the window must not
    // add one — it partitions on the key the second groupBy hashed on
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges in:\n$plan")
  }
}
