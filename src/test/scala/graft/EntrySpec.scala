package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: t1 smoke (entry rows > 0), registry
  * consistency (every oracle key has a query; names are unique). */
class EntrySpec extends SparkSpec {

  test("entry flagship query returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; names unique") {
    val qnames = SparkEntry.queries.keySet
    val onames = SparkEntry.oracleSql.keySet
    assert(onames.subsetOf(qnames), s"orphan oracles: ${onames -- qnames}")
    assert(SparkEntry.queries.size >= 70 - 10) // registry didn't silently shrink
  }

  test("TopKPerGroup custom node lowers to window+filter and runs") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)).toDF("g", "v")
    val out = graft.plans.TopKPerGroup(df, Seq("g"), "v", descending = true, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 3), ("a", 2), ("b", 9), ("b", 8)))
    // schema preserved (the helper column is projected away)
    assert(graft.plans.TopKPerGroup(df, Seq("g"), "v", descending = true, k = 1)
      .columns.toSeq == Seq("g", "v"))
  }

  test("GraftExtensions injects function + rule into a fresh session") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").withExtensions(new GraftExtensions).getOrCreate()
      val d = s.sql("SELECT array_dot(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS d")
        .head().getDouble(0)
      assert(d == 8.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("all queries build a plan against sf0.001 (no analysis errors)") {
    val dir = sf()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, dir).schema // forces analysis, not execution
      catch { case e: Throwable => fail(s"$name failed analysis: ${e.getMessage}") }
    }
  }
}
