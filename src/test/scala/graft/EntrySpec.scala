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

  test("all queries build a plan against sf0.001 (no analysis errors)") {
    val dir = sf()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, dir).schema // forces analysis, not execution
      catch { case e: Throwable => fail(s"$name failed analysis: ${e.getMessage}") }
    }
  }
}
