package graft.operators

import graft.SparkSpec
import graft.core.{PipelineMetrics, Pipeline, SoftError}
import org.apache.spark.sql.functions._

case class L(k: Long, t: Long, tag: String)
case class R(rk: Long, rt: Long, payload: String, seq: Long)

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    L(1, 10, "e1"), L(1, 20, "e2"), L(1, 5, "e0"),
    L(2, 10, "f1"),
    L(3, 10, "g1") // key with no right rows
  ).toDF()
  private val right = Seq(
    R(1, 10, "r-at-10", 1), R(1, 10, "r-at-10-later", 2), // tie at t=10
    R(1, 15, "r-at-15", 3),
    R(2, 11, "s-at-11", 4)
  ).toDF()

  private def run() = AsOfJoin.asofJoin(
    left, right, "k", "rk", "t", "rt",
    payload = Seq("payload"), rightTiebreak = "seq")
    .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("tag"),
      r.getAs[String]("asof_payload"))).toSet

  test("as-of picks the latest right row at or before the left time") {
    val out = run()
    assert(out.contains((1L, "e0", null))) // t=5: nothing yet
    // t=10 tie is inclusive; among equal times the max tiebreak wins
    assert(out.contains((1L, "e1", "r-at-10-later")))
    assert(out.contains((1L, "e2", "r-at-15")))
    assert(out.contains((2L, "f1", null))) // right row is later (t=11)
    assert(out.contains((3L, "g1", null))) // no right rows for key
    assert(out.size == 5) // exactly one output row per left row
  }

  test("range join assigns rows to [lo, hi) intervals") {
    val iv = Seq((0L, 10L, "low"), (10L, 100L, "high")).toDF("lo", "hi", "band")
    val out = AsOfJoin.rangeJoin(left, iv, "t")
      .select("tag", "band").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("e0" -> "low", "e1" -> "high", "e2" -> "high",
      "f1" -> "high", "g1" -> "high"))
  }
}

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observed metrics: totals, failed, critical (pipeline.count parity)") {
    val src = spark.createDataset((1 to 20).map(i => graft.core.Doc(s"t$i", i)))
    val ds = Pipeline.of(src)
      .append("maybe_fail") { d =>
        if (d.count % 5 == 0) throw new SoftError("soft")
        if (d.count == 7) throw new RuntimeException("crit")
        d
      }
      .build()
    val (observedDs, obs) = PipelineMetrics.observed(ds)
    observedDs.write.mode("overwrite").format("noop").save()
    val m = obs.get
    assert(m("n_items") == 20L)
    assert(m("n_failed") == 5L) // 4 soft (5,10,15,20) + 1 critical (7)
    assert(m("n_critical") == 1L)
  }

  test("errorsOf flattens the error channel for sinks") {
    val src = spark.createDataset((1 to 10).map(i => graft.core.Doc(s"t$i", i)))
    val ds = Pipeline.of(src)
      .append("fail_even") { d =>
        if (d.count % 2 == 0) throw new SoftError(s"bad ${d.count}")
        d
      }
      .build()
    val errs = PipelineMetrics.errorsOf(ds).collect()
    assert(errs.length == 5)
    assert(errs.forall(_.getAs[String]("stage") == "fail_even"))
    assert(errs.forall(_.getAs[String]("severity") == "soft"))
  }

  test("dataSnippet truncates long payload reprs") {
    val item = graft.core.Tracked(graft.core.Doc("x" * 500, 1))
    assert(PipelineMetrics.dataSnippet(item).length == 101)
    assert(PipelineMetrics.dataSnippet(item, 10).endsWith("…"))
  }
}
