package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  // 20k values over 16 partitions: partial aggregation, buffer serialization
  // and cross-partition merge all exercise. Values are a shuffled permutation
  // so the exact quantiles are known in closed form.
  private lazy val values = {
    val rnd = new scala.util.Random(7)
    rnd.shuffle((1 to 20000).toVector).map(_.toDouble)
  }
  private lazy val df = values.zipWithIndex
    .map { case (v, i) => (i % 10L, v) }
    .toDF("day", "v").repartition(16)

  test("direct sketch quantiles land within the GK rank bound") {
    val sk = df.agg(QSketch.sketchAgg(col("v"), 0.01).as("sk"))
    val got = sk.select(
      QSketch.query(col("sk"), 0.5).as("p50"),
      QSketch.query(col("sk"), 0.95).as("p95")).head()
    // eps = 0.01 on n = 20000 → rank error ≤ 200 positions
    assert(math.abs(got.getDouble(0) - 10000d) <= 200d)
    assert(math.abs(got.getDouble(1) - 19000d) <= 200d)
  }

  test("merging stored per-day sketches equals one global sketch's bound") {
    val daily = df.groupBy("day").agg(QSketch.sketchAgg(col("v"), 0.01).as("sk"))
    assert(daily.count() == 10)
    val merged = daily.agg(QSketch.mergeAgg(col("sk")).as("msk"))
      .select(QSketch.query(col("msk"), 0.5).as("p50"),
        QSketch.query(col("msk"), 0.95).as("p95")).head()
    // merge degrades eps by at most an additive eps → allow 2x the bound
    assert(math.abs(merged.getDouble(0) - 10000d) <= 400d)
    assert(math.abs(merged.getDouble(1) - 19000d) <= 400d)
  }

  test("SQL surface: qsketch_agg / qsketch_merge_agg / qsketch_query") {
    df.createOrReplaceTempView("qsk_in")
    val r = spark.sql("""SELECT qsketch_query(qsketch_merge_agg(sk), 0.5D) AS p50
      FROM (SELECT day, qsketch_agg(v, 0.01D) AS sk FROM qsk_in GROUP BY day)""")
      .head()
    assert(math.abs(r.getDouble(0) - 10000d) <= 400d)
  }

  test("nulls are skipped; an all-null group queries as NULL") {
    val withNulls = Seq((1L, Some(5d)), (1L, None), (2L, None))
      .toDF("g", "v")
    val out = withNulls.groupBy("g")
      .agg(QSketch.sketchAgg(col("v"), 0.1).as("sk"))
      .select(col("g"), QSketch.query(col("sk"), 0.5).as("p"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L) == Some(5d))
    assert(out(2L) == None)
  }

  test("empty-sketch rows are transparent to the union") {
    val daily = df.groupBy("day").agg(QSketch.sketchAgg(col("v"), 0.01).as("sk"))
    val emptySk = Seq(Tuple1(Option.empty[Double])).toDF("v")
      .agg(QSketch.sketchAgg(col("v"), 0.01).as("sk"))
    val merged = daily.select("sk").union(emptySk)
      .agg(QSketch.mergeAgg(col("sk")).as("msk"))
      .select(QSketch.query(col("msk"), 0.5)).head()
    assert(math.abs(merged.getDouble(0) - 10000d) <= 400d)
  }

  test("mixed-eps sketches are rejected loudly") {
    val a = df.filter(col("day") < 5).agg(QSketch.sketchAgg(col("v"), 0.01).as("sk"))
    val b = df.filter(col("day") >= 5).agg(QSketch.sketchAgg(col("v"), 0.05).as("sk"))
    val ex = intercept[Exception] {
      a.union(b).agg(QSketch.mergeAgg(col("sk"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("mixed sketch eps")))
  }

  test("serialization round-trips the summary exactly") {
    var qs = new org.apache.spark.sql.catalyst.util.QuantileSummaries(
      org.apache.spark.sql.catalyst.util.QuantileSummaries.defaultCompressThreshold, 0.02)
    (1 to 999).foreach(i => qs = qs.insert(i.toDouble))
    val back = QSketch.deserialize(QSketch.serialize(qs))
    assert(back.count == 999)
    assert(back.relativeError == 0.02)
    assert(back.query(0.5) == qs.compress().query(0.5))
  }
}
