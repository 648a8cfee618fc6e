package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0), "ok", "A"),
    (2L, Some(20.0), "ok", "B"),
    (2L, Some(-5.0), "bad!", "A"),   // dup id, out of range, regex viol
    (3L, None, "ok", "C")            // null amt, C not allowed
  ).toDF("id", "amt", "tag", "cat")
    .select(col("id"), col("amt"), col("tag"), col("cat"))

  test("each expectation counts its violations exactly; suite runs as one report") {
    val rep = Expectations.check(df, Seq(
      NotNull("amt"),
      InRange("amt", 0.0, 100.0),
      MatchesRegex("tag", "^[a-z]+$"),
      OneOf("cat", Seq("A", "B")),
      Unique("id")
    )).collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("not_null(amt)") == (1L, false))
    assert(rep("in_range(amt,0.0,100.0)") == (2L, false)) // -5 and the null
    assert(rep("matches_regex(tag)") == (1L, false))
    assert(rep("one_of(cat)") == (1L, false))
    assert(rep("unique(id)") == (1L, false)) // one extra copy of id=2
    assert(rep("_row_count") == (4L, true))
  }

  test("a clean table passes everything; empty input is visible via _row_count") {
    val clean = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "amt")
    assert(Expectations.passes(clean, Seq(NotNull("amt"), Unique("id"),
      InRange("amt", 0.0, 10.0))))
    val empty = clean.limit(0)
    val rep = Expectations.check(empty, Seq(NotNull("amt"), Unique("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("not_null(amt)" -> 0L, "unique(id)" -> 0L, "_row_count" -> 0L))
  }

  test("foreign keys: orphans counted, nulls exempt, dup dim keys don't multiply") {
    val fact = Seq(
      (1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)), // 99 is an orphan
      (4L, None)                                          // null fk: exempt
    ).toDF("id", "fk")
    val dim = Seq(10L, 10L, 20L).toDF("k") // 10 duplicated on purpose
    val rep = Expectations.checkWithRelations(fact, Seq(NotNull("id")),
        Seq(ForeignKey("fk", "dim", dim, "k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("foreign_key(fk->dim.k)") == (1L, false)) // only id=3's 99
    assert(rep("not_null(id)") == (0L, true))
    assert(rep("_row_count") == (4L, true))
  }

  test("foreign keys: clean relation passes; empty fact yields zero orphans") {
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("id", "fk")
    val dim = Seq(10L, 20L, 30L).toDF("k")
    val rep = Expectations.checkWithRelations(fact, Seq(NotNull("fk")),
        Seq(ForeignKey("fk", "dim", dim, "k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rep("foreign_key(fk->dim.k)") == (0L, true))
    val emptyRep = Expectations.checkWithRelations(fact.limit(0),
        Seq(NotNull("fk")), Seq(ForeignKey("fk", "dim", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(emptyRep("foreign_key(fk->dim.k)") == 0L)
    assert(emptyRep("_row_count") == 0L)
  }

  test("fdAudit: exact g3' confidence, null-as-value grouping, empty input") {
    import Expectations.Fd
    // x -> {1:2, 2:1} violates (keep 2 of 3); y -> {3:1} holds
    val d = Seq(("x", "1"), ("x", "1"), ("x", "2"), ("y", "3"))
      .toDF("src", "lang")
    val rep = Expectations.fdAudit(d, Seq(Fd(Seq("src"), "lang")))
      .head()
    assert(rep.getString(0) == "fd(src->lang)")
    assert((rep.getLong(1), rep.getLong(2), rep.getLong(3)) == (2L, 1L, 4L))
    assert(rep.getLong(4) == 750000L) // floor(1e6 * 3 / 4)
    // NULL dependent groups as a value: (x,NULL)+(x,NULL) agree,
    // (y,NULL)+(y,'a') violate
    val n = Seq(("x", None: Option[String]), ("x", None),
      ("y", None), ("y", Some("a"))).toDF("src", "lang")
    val repN = Expectations.fdAudit(n, Seq(Fd(Seq("src"), "lang"))).head()
    assert((repN.getLong(2), repN.getLong(4)) == (1L, 750000L))
    // exact FD: confidence 10^6, zero violating groups
    val holds = Expectations.fdAudit(d, Seq(Fd(Seq("lang"), "src"))).head()
    assert(holds.getLong(2) == 0L && holds.getLong(4) == 1000000L)
    // empty input: zero counts, NULL confidence (not a fake 10^6)
    val e = Expectations.fdAudit(d.limit(0), Seq(Fd(Seq("src"), "lang"))).head()
    assert(e.getLong(1) == 0L && e.getLong(3) == 0L && e.isNullAt(4))
  }

  test("Implies: out-of-scope rows pass, null consequence under a true premise violates") {
    // scope = cat 'A': id 1 (amt 10 -> then holds), id 2b (amt -5 -> then
    // fails); cat 'B'/'C' rows are out of scope however their amt looks;
    // a null amt under a true premise must violate, not pass
    val withNullA = df.unionByName(
      Seq((9L, Option.empty[Double], "ok", "A")).toDF("id", "amt", "tag", "cat"))
    val rep = Expectations.check(withNullA, Seq(
      Implies("cat = 'A'", "amt >= 0.0"),
      Implies("cat = 'Z'", "amt >= 1e9") // empty scope: vacuously clean
    )).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("implies(cat = 'A' -> amt >= 0.0)") == 2L) // -5 and the null
    assert(rep("implies(cat = 'Z' -> amt >= 1e9)") == 0L)
  }

  test("the suite is one aggregate pass (single scan, no join)") {
    val plan = Expectations.check(df, Seq(NotNull("amt"), InRange("amt", 0, 1),
      MatchesRegex("tag", "x"), OneOf("cat", Seq("A"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"suite must not join:\n$plan")
    // scan-local suite (no Unique): no Expand either
    assert(!plan.contains("Expand"), s"scan-local suite must not Expand:\n$plan")
  }
}
