package graft

import org.apache.spark.sql.functions._

/** Guards the testdata loaders — especially the TIMESTAMP(NANOS) shim for
  * events, which the whole events-query family depends on. */
class TablesSpec extends SparkSpec {

  test("events loader yields µs timestamps for either physical ts form") {
    // The driver's testdata has shipped ts as both TIMESTAMP(NANOS) (read
    // via the legacy long shim + floor) and TIMESTAMP(MICROS) (direct);
    // the loader must produce the same µs value for either generation.
    val ev = Tables.events(spark, sf())
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val r = ev.orderBy("event_id").select("event_id", "ts").head()
    // event 0 at sf0.001: 2024-01-01 00:09:58.778549(829) → µs floor
    assert(r.getLong(0) == 0L)
    assert(r.getTimestamp(1).toString == "2024-01-01 00:09:58.778549")
  }

  test("all star-schema tables load with pushdown-friendly scans") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")) {
      val df = Tables.table(spark, sf(), t)
      assert(df.count() > 0, s"table $t empty")
    }
  }

  test("decimal helpers are exact on 2-decimal money values") {
    import spark.implicits._
    // values whose double sum is NOT exactly representable in naive fp order
    val df = Seq(0.1, 0.2, 0.3, 100.01, 99.99).toDF("x")
    val got = df.agg(Dec.dsum(col("x"))).head().getDouble(0)
    assert(got == 200.6) // exact decimal sum, cast once at the end
  }
}
