package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("constant metric: every replica mean equals the constant, CI collapses to the point") {
    val rows = spark.range(500).select(col("id"), lit(7L).as("x"))
    val out = Bootstrap.meanCi(rows, "id", "x", replicas = 40).head()
    assert(out.getAs[Long]("n_rows") == 500L)
    assert(out.getAs[Long]("mean_ppm") == 7000000L)
    assert(out.getAs[Long]("ci_lo_ppm") == 7000000L)
    assert(out.getAs[Long]("ci_hi_ppm") == 7000000L)
    assert(out.getAs[Long]("n_replicas") == 40L)
  }

  test("noisy metric: CI is non-degenerate, brackets the point mean, narrows with n") {
    def ci(n: Long) = {
      val rows = spark.range(n).select(col("id"), (col("id") % 100).as("x"))
      val r = Bootstrap.meanCi(rows, "id", "x", replicas = 40).head()
      (r.getAs[Long]("mean_ppm"), r.getAs[Long]("ci_lo_ppm"),
        r.getAs[Long]("ci_hi_ppm"))
    }
    val (m1, lo1, hi1) = ci(400)
    assert(lo1 < hi1)
    assert(lo1 <= m1 && m1 <= hi1, (lo1, m1, hi1).toString)
    val (_, lo2, hi2) = ci(40000)
    // 100x the data: ~10x narrower interval (allow slack for 40 replicas)
    assert((hi2 - lo2) * 4 < (hi1 - lo1), s"n=400: ${hi1 - lo1}, n=40000: ${hi2 - lo2}")
  }

  test("weights follow the quantized Poisson(1) pmf (hash-uniform buckets)") {
    // measure the replica-0 weight distribution over 20k ids
    val rows = spark.range(20000).select(col("id"), lit(1L).as("x"))
    val w = rows.select(
      graft.expressions.PolyHash(concat(lit("boot|0|"),
        col("id").cast("string"))).%(1000).as("bucket"))
      .select(when(col("bucket") < 368, 0).when(col("bucket") < 736, 1)
        .when(col("bucket") < 920, 2).otherwise(3).as("w"))
      .groupBy("w").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def share(k: Int) = w.getOrElse(k, 0L) / 20000.0
    assert(math.abs(share(0) - 0.368) < 0.02, w.toString)
    assert(math.abs(share(1) - 0.368) < 0.02, w.toString)
    assert(math.abs(share(2) - 0.184) < 0.02, w.toString)
  }

  test("deterministic under repartition; a different salt draws different resamples") {
    val rows = spark.range(1000).select(col("id"), (col("id") % 13).as("x"))
    val a = Bootstrap.meanCi(rows, "id", "x", replicas = 40).head()
    val b = Bootstrap.meanCi(rows.repartition(7), "id", "x", replicas = 40).head()
    assert(a == b)
    val c = Bootstrap.meanCi(rows, "id", "x", replicas = 40, salt = "s2").head()
    assert(a.getAs[Long]("mean_ppm") == c.getAs[Long]("mean_ppm")) // point mean is salt-free
    assert((a.getAs[Long]("ci_lo_ppm"), a.getAs[Long]("ci_hi_ppm")) !=
      (c.getAs[Long]("ci_lo_ppm"), c.getAs[Long]("ci_hi_ppm")))
  }

  test("grouped CIs: a single-group slice reproduces meanCi exactly (same resample universe)") {
    val rows = spark.range(2000)
      .select(col("id"), (col("id") % 17).as("x"), lit("only").as("src"))
    val whole = Bootstrap.meanCi(rows, "id", "x", replicas = 40).head()
    val sliced = Bootstrap.meanCiByGroup(rows, "id", "x", "src", replicas = 40).head()
    assert(sliced.getAs[String]("src") == "only")
    for (c <- Seq("n_rows", "mean_ppm", "n_replicas", "ci_lo_ppm", "ci_hi_ppm"))
      assert(sliced.getAs[Long](c) == whole.getAs[Long](c), c)
  }

  test("grouped CIs: per-group means exact, constant group collapses, repartition-invariant") {
    // group a: constant 5 -> CI collapses to the point; group b: id % 13
    val rows = spark.range(3000).select(col("id"),
      when(col("id") % 2 === 0, lit(5L)).otherwise(col("id") % 13).as("x"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("src"))
    val out = Bootstrap.meanCiByGroup(rows, "id", "x", "src", replicas = 40)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("mean_ppm") == 5000000L)
    assert(a.getAs[Long]("ci_lo_ppm") == 5000000L
      && a.getAs[Long]("ci_hi_ppm") == 5000000L)
    val b = out("b")
    assert(b.getAs[Long]("n_rows") == 1500L)
    assert(b.getAs[Long]("ci_lo_ppm") <= b.getAs[Long]("mean_ppm")
      && b.getAs[Long]("mean_ppm") <= b.getAs[Long]("ci_hi_ppm"))
    assert(b.getAs[Long]("ci_lo_ppm") < b.getAs[Long]("ci_hi_ppm"))
    val rep = Bootstrap.meanCiByGroup(
      spark.range(3000).select(col("id"),
        when(col("id") % 2 === 0, lit(5L)).otherwise(col("id") % 13).as("x"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("src"))
        .repartition(11),
      "id", "x", "src", replicas = 40)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    assert(rep("b") == b && rep("a") == a)
  }

  test("deltaCi: constant slices collapse to the exact difference; delta coheres with the slice means") {
    def frame(n: Long) = spark.range(n).select(col("id"),
      when(col("id") % 2 === 0, lit(9L)).otherwise(lit(4L)).as("x"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("src"))
    val cst = Bootstrap.deltaCi(frame(2000), "id", "x", "src", "a", "b").head()
    assert(cst.getAs[Long]("delta_ppm") == 5000000L)
    assert(cst.getAs[Long]("ci_lo_ppm") == 5000000L
      && cst.getAs[Long]("ci_hi_ppm") == 5000000L)
    assert(cst.getAs[Long]("mean_a_ppm") == 9000000L
      && cst.getAs[Long]("mean_b_ppm") == 4000000L)
    // noisy slices: delta == difference of the grouped point means, the
    // CI brackets it, and the result is repartition-invariant
    def noisy(n: Long) = spark.range(n).select(col("id"),
      when(col("id") % 2 === 0, col("id") % 17).otherwise(col("id") % 5).as("x"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("src"))
    val d = Bootstrap.deltaCi(noisy(4000), "id", "x", "src", "a", "b").head()
    val g = Bootstrap.meanCiByGroup(noisy(4000), "id", "x", "src")
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Long]("mean_ppm")).toMap
    assert(d.getAs[Long]("delta_ppm") == g("a") - g("b"))
    assert(d.getAs[Long]("ci_lo_ppm") <= d.getAs[Long]("delta_ppm")
      && d.getAs[Long]("delta_ppm") <= d.getAs[Long]("ci_hi_ppm"))
    assert(d.getAs[Long]("ci_lo_ppm") < d.getAs[Long]("ci_hi_ppm"))
    val rep = Bootstrap.deltaCi(noisy(4000).repartition(13),
      "id", "x", "src", "a", "b").head()
    assert(rep == d)
  }

  test("pairedDeltaCi: constant diff collapses exactly; pairing beats independent resampling on correlated metrics") {
    // xa = xb + 7 on every row: a paired bootstrap sees a CONSTANT diff
    // — zero-width CI at exactly 7e6 — however noisy the shared level is
    val paired = spark.range(2000).select(col("id"),
      (col("id") % 97 + 7L).as("xa"), (col("id") % 97).as("xb"))
    val c = Bootstrap.pairedDeltaCi(paired, "id", "xa", "xb").head()
    assert(c.getAs[Long]("n_rows") == 2000L)
    assert(c.getAs[Long]("delta_ppm") == 7000000L)
    assert(c.getAs[Long]("ci_lo_ppm") == 7000000L
      && c.getAs[Long]("ci_hi_ppm") == 7000000L)
    assert(c.getAs[Long]("mean_a_ppm") - c.getAs[Long]("mean_b_ppm") == 7000000L)
    // the same two metrics fed through the UNPAIRED two-slice form (rows
    // duplicated into slices) must give a strictly wider interval — the
    // design decision the named wrapper exists for, demonstrated
    val asSlices = paired.select(col("id"), col("xa").as("x"), lit("a").as("src"))
      .union(paired.select(col("id") + 10000L, col("xb"), lit("b")))
    val u = Bootstrap.deltaCi(asSlices, "id", "x", "src", "a", "b").head()
    assert(u.getAs[Long]("ci_hi_ppm") - u.getAs[Long]("ci_lo_ppm") > 0L)
    // repartition-invariant (pure (i,b)-hash resamples)
    val rep = Bootstrap.pairedDeltaCi(paired.repartition(13), "id", "xa", "xb").head()
    assert(rep == c)
  }
}
