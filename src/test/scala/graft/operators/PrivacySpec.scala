package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val cells = Seq(
    ("us", "auto", 12L, 120L),
    ("us", "home", 3L, 30L),   // small
    ("de", "auto", 2L, 20L),   // small
    ("de", "home", 15L, 150L)
  ).toDF("country", "segment", "n", "amount")

  test("cells below k fold into one residual row; totals are preserved") {
    val out = Privacy.suppressSmallCells(cells, Seq("country", "segment"), "n", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("us", "auto")) == (12L, 120L))
    assert(out(("de", "home")) == (15L, 150L))
    assert(out(("__suppressed__", "__suppressed__")) == (5L, 50L)) // 3+2 folded
    assert(out.size == 3)
    // nothing dropped: totals match the input exactly
    assert(out.values.map(_._1).sum == 32L)
    assert(out.values.map(_._2).sum == 320L)
  }

  test("no small cells -> input unchanged; all small -> one residual row") {
    val none = Privacy.suppressSmallCells(cells, Seq("country", "segment"), "n", k = 1)
    assert(none.count() == 4)
    val all = Privacy.suppressSmallCells(cells, Seq("country", "segment"), "n", k = 100)
      .collect()
    assert(all.length == 1)
    assert(all(0).getString(0) == "__suppressed__" && all(0).getLong(2) == 32L)
  }

  test("null keys participate like values and mask when small") {
    val withNull = Seq((Some("us"), 12L), (None: Option[String], 2L))
      .toDF("country", "n")
    val out = Privacy.suppressSmallCells(withNull, Seq("country"), "n", k = 5)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out(Some("us")) == 12L)
    assert(out(Some("__suppressed__")) == 2L) // the null-key cell, masked
  }

  test("pseudonymize: joins survive tokenization, raw ids leave, nulls stay null") {
    val facts = Seq((Some(1L), 10.0), (Some(1L), 20.0), (Some(2L), 5.0),
      (None, 7.0)).toDF("cust", "amt")
    val dim = Seq((1L, "GOLD"), (2L, "SILVER"), (3L, "GOLD")).toDF("cust", "tier")
    val tf = Privacy.pseudonymize(facts, Seq("cust"), "s3cret")
    val td = Privacy.pseudonymize(dim, Seq("cust"), "s3cret")
    // same (secret, value) -> same token across tables: the join still works
    val joined = tf.join(td, Seq("cust"))
      .groupBy("tier").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(joined == Map("GOLD" -> 2L, "SILVER" -> 1L))
    // tokens are 32-hex md5, never the raw id; NULL stays NULL
    val toks = tf.select("cust").collect().map(r =>
      Option(r.getString(0)))
    assert(toks.count(_.isEmpty) == 1)
    assert(toks.flatten.forall(t => t.length == 32 && t.matches("[0-9a-f]+")))
    // a different secret unlinks the releases
    val other = Privacy.pseudonymize(dim, Seq("cust"), "other")
      .select("cust").as[String].collect().toSet
    assert(other.intersect(td.select("cust").as[String].collect().toSet).isEmpty)
  }

  test("k-anonymity holds: no published non-residual row is below k") {
    val out = Privacy.suppressSmallCells(cells, Seq("country", "segment"), "n", k = 10)
      .filter(col("country") =!= "__suppressed__")
    assert(out.filter(col("n") < 10).isEmpty)
  }

  test("l-diversity: homogeneous groups fold; residual distinct is over the UNION, not a sum") {
    import spark.implicits._
    // g1: 3 rows, 3 distinct (diverse at l=3)
    // g2: 4 rows, 1 distinct (homogeneous) — sensitive value "x"
    // g3: 2 rows, 2 distinct (below l)     — sensitive values "x","y"
    val rows = Seq(
      ("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "x"), ("g2", "x"), ("g2", "x"), ("g2", "x"),
      ("g3", "x"), ("g3", "y")).toDF("qi", "sv")
    val out = Privacy.lDiversityPublish(rows, Seq("qi"), "sv", l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // residual unions g2+g3: 6 rows, distinct {x, y} = 2 (NOT 1+2=3)
    assert(out == Set(("g1", 3L, 3L), ("__suppressed__", 6L, 2L)))
  }

  test("l-diversity: nothing suppressed -> no residual row; everything suppressed -> only the residual") {
    import spark.implicits._
    val diverse = Seq(("g", "a"), ("g", "b")).toDF("qi", "sv")
    val d = Privacy.lDiversityPublish(diverse, Seq("qi"), "sv", l = 2).collect()
    assert(d.length == 1 && d.head.getString(0) == "g")
    val homog = Seq(("g", "a"), ("h", "b")).toDF("qi", "sv")
    val h = Privacy.lDiversityPublish(homog, Seq("qi"), "sv", l = 2).collect()
    assert(h.length == 1 && h.head.getString(0) == "__suppressed__")
    assert(h.head.getLong(1) == 2L && h.head.getLong(2) == 2L)
  }

  test("l-diversity published groups all satisfy l; totals preserved") {
    import spark.implicits._
    val rows = spark.range(200).select(
      (col("id") % 7).cast("string").as("qi"),
      (col("id") % (col("id") % 7 + 1)).cast("string").as("sv"))
    val out = Privacy.lDiversityPublish(rows, Seq("qi"), "sv", l = 4)
    assert(out.filter(col("qi") =!= "__suppressed__" &&
      col("n_distinct_sensitive") < 4).isEmpty)
    assert(out.agg(sum("n_rows")).as[Long].head() == 200L)
  }

  test("t-closeness: hand-computed TVD, verdict at the boundary, skewed group flagged") {
    import spark.implicits._
    // global {x:3, y:1} over 4 rows; group A = {x,x,x} (no=3):
    //   S = |3·4−3·3| + |0·4−1·3| = 6 → tvd = 1e6·6/(2·3·4) = 250000;
    // group B = {y} (no=1): S = |0−3| + |4−1| = 6 → tvd = 6e6/8 = 750000
    val rows = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("B", "y"))
      .toDF("qi", "sv")
    val out = Privacy.tClosenessAudit(rows, Seq("qi"), "sv",
      tMillionths = 500000L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("tvd_millionths"),
          r.getAs[Boolean]("publish")))).toMap
    assert(out("A") == ((3L, 250000L, true)))
    assert(out("B") == ((1L, 750000L, false)))
    // boundary is inclusive: t exactly at a group's tvd publishes it
    val atBoundary = Privacy.tClosenessAudit(rows, Seq("qi"), "sv", 250000L)
      .filter(col("qi") === "A").head().getAs[Boolean]("publish")
    assert(atBoundary)
    // a group distributed exactly like the global one has tvd 0
    val uniform = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("qi", "sv")
    Privacy.tClosenessAudit(uniform, Seq("qi"), "sv", 10000L).collect()
      .foreach(r => assert(r.getAs[Long]("tvd_millionths") == 0L
        && r.getAs[Boolean]("publish")))
    intercept[IllegalArgumentException] {
      Privacy.tClosenessAudit(rows, Seq.empty, "sv", 1000L)
    }
    intercept[IllegalArgumentException] {
      Privacy.tClosenessAudit(rows, Seq("qi"), "sv", 0L)
    }
  }
}
