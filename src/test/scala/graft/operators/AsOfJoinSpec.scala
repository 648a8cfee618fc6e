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

  test("bucketed as-of join matches the unsalted plan on a hot-key workload") {
    // hot key 1 with many rows across time + sparse keys; payload nulls
    // exercise the per-column last-non-null independence; bucket width 10
    // puts bucket boundaries right on top of tie timestamps
    val rnd = new scala.util.Random(5)
    val bigLeft = (0 until 400).map { i =>
      val k = if (i % 4 == 0) 2L else 1L // 300 rows on the hot key
      L(k, rnd.nextInt(100).toLong, s"e$i")
    }.toDF()
    val bigRight = (0 until 120).map { i =>
      val k = if (i % 5 == 0) 2L else 1L
      R(k, rnd.nextInt(100).toLong,
        if (i % 7 == 0) null else s"p$i", i.toLong)
    }.toDF()
    for (inclusive <- Seq(true, false)) {
      // tags are unique per left row, so set-compare (sorting tuples with
      // null payloads would NPE)
      val plain = AsOfJoin.asofJoin(bigLeft, bigRight, "k", "rk", "t", "rt",
        payload = Seq("payload"), rightTiebreak = "seq", inclusive = inclusive)
        .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
      val bucketed = AsOfJoin.asofJoinBucketed(bigLeft, bigRight, "k", "rk", "t", "rt",
        payload = Seq("payload"), rightTiebreak = "seq",
        bucketOf = t => floor(t / 10), inclusive = inclusive)
        .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
      assert(bucketed.size == 400 && plain.size == 400)
      assert(bucketed == plain, s"inclusive=$inclusive mismatch")
    }
  }

  test("salted per-group top-k matches the plain window on a hot-key workload") {
    val rnd = new scala.util.Random(9)
    // one hot key with 800 rows, a few sparse keys; value ties exercise the
    // tiebreak column
    val rows = (0 until 1000).map { i =>
      val k = if (i % 5 == 0) i % 7 else 999
      (k.toLong, rnd.nextInt(50).toLong, i.toLong)
    }.toDF("grp", "score", "row_id")
    val order = Seq(col("score").desc, col("row_id"))
    val plain = TopK.perGroup(rows, Seq("grp"), order, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = TopK.perGroupSalted(rows, Seq("grp"), order, k = 3,
      saltOf = xxhash64(col("row_id")), salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain == salted)
    assert(plain.count(_._1 == 999L) == 3) // hot key produced exactly k
  }

  test("bucketed trailing sum matches the plain range frame on a hot-key workload") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 600).map { i =>
      val k = if (i % 4 == 0) i % 3 else 7L // hot key 7 with 450 rows
      (k.toLong, rnd.nextInt(200).toLong, rnd.nextInt(10) + 1L, i.toLong)
    }.toDF("k", "t", "v", "row_id")
    for (frame <- Seq(7L, 25L); bw <- Seq(frame, frame * 3)) {
      val plain = TrailingAgg.trailingSum(rows, "k", "t", "v", frame)
        .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
      val bucketed = TrailingAgg.trailingSumBucketed(rows, "k", "t", "v", frame, bw)
        .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
      assert(bucketed == plain, s"frame=$frame bucketWidth=$bw mismatch")
    }
    intercept[IllegalArgumentException](
      TrailingAgg.trailingSumBucketed(rows, "k", "t", "v", frame = 10, bucketWidth = 5))
  }

  test("bucketed running sum matches the plain unbounded window on a hot-key workload") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map { i =>
      val k = if (i % 5 == 0) i % 2 else 9L
      (k.toLong, rnd.nextInt(100).toLong, rnd.nextInt(20) + 1L, i.toLong)
    }.toDF("k", "t", "v", "row_id")
    for (bw <- Seq(1L, 13L, 50L)) {
      val p = RunningAgg.runningSum(rows, "k", "t", Seq("row_id"), "v")
        .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
      val b = RunningAgg.runningSumBucketed(rows, "k", "t", Seq("row_id"), "v", bw)
        .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
      assert(b == p, s"bucketWidth=$bw mismatch")
    }
  }

  test("bucketed next-event time matches the plain lead on a hot-key workload") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 500).map { i =>
      val k = if (i % 5 == 0) i % 2 else 9L // hot key 9 with 400 rows
      (k.toLong, rnd.nextInt(300).toLong - 50L, i.toLong) // negatives too
    }.toDF("k", "t", "row_id")
    for (bw <- Seq(1L, 17L, 1000L)) {
      val p = NextEvent.nextTime(rows, "k", "t", Seq("row_id"))
        .collect().map(r => (r.getLong(2), Option(r.get(3)))).toSet
      val b = NextEvent.nextTimeBucketed(rows, "k", "t", Seq("row_id"), bw)
        .collect().map(r => (r.getLong(2), Option(r.get(3)))).toSet
      assert(b == p, s"bucketWidth=$bw mismatch")
    }
    // each key's globally-last row must stay null in both
    assert(NextEvent.nextTimeBucketed(rows, "k", "t", Seq("row_id"), 17L)
      .filter(col("next_t").isNull).count() == 3)
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

  test("timingSummary rolls per-record stage timings up to fleet stats") {
    val src = spark.createDataset((1 to 12).map(i => graft.core.Doc(s"t$i", i)))
    val ds = Pipeline.of(src)
      .append("s1")(identity[graft.core.Doc])
      .append("s2")(identity[graft.core.Doc])
      .build()
    val rows = PipelineMetrics.timingSummary(ds).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n"), r.getAs[Double]("total_s"))).toMap
    assert(rows.keySet == Set("s1", "s2"))
    rows.values.foreach { case (n, tot) =>
      assert(n == 12L, "every record carries a timing per stage")
      assert(tot >= 0.0)
    }
  }

  test("foreachErrorSink runs onStart/handle/onEnd per partition, onEnd on failure too") {
    ErrSinkState.reset()
    val src = spark.createDataset((1 to 20).map(i => graft.core.Doc(s"t$i", i)))
    val ds = Pipeline.of(src)
      .append("fail_even") { d =>
        if (d.count % 2 == 0) throw new SoftError(s"bad ${d.count}")
        d
      }
      .build()
    PipelineMetrics.foreachErrorSink(ds.repartition(2))(
      () => ErrSinkState.opened.incrementAndGet()) { (_, row) =>
      ErrSinkState.handled.incrementAndGet()
      assert(row.getAs[String]("stage") == "fail_even")
    }(_ => ErrSinkState.closed.incrementAndGet())
    assert(ErrSinkState.handled.get() == 10)
    assert(ErrSinkState.opened.get() == 2, "onStart once per partition")
    assert(ErrSinkState.closed.get() == ErrSinkState.opened.get())

    // a handler that throws must still see its connection closed (on_end
    // is the reference's teardown guarantee, not a happy-path hook)
    ErrSinkState.reset()
    intercept[Exception] {
      PipelineMetrics.foreachErrorSink(ds.coalesce(1))(
        () => ErrSinkState.opened.incrementAndGet()) { (_, _) =>
        throw new RuntimeException("sink down")
      }(_ => ErrSinkState.closed.incrementAndGet())
    }
    assert(ErrSinkState.opened.get() >= 1)
    assert(ErrSinkState.closed.get() == ErrSinkState.opened.get(),
      "onEnd must run via finally when the handler throws")
  }

  test("errorSummary groups the error channel by stage and severity") {
    val src = spark.createDataset((1 to 10).map(i => graft.core.Doc(s"t$i", i)))
    val ds = Pipeline.of(src)
      .append("gate") { d =>
        if (d.count % 2 == 0) throw new SoftError("soft")
        if (d.count == 3) throw new RuntimeException("crit")
        d
      }
      .build()
    val out = PipelineMetrics.errorSummary(ds).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[String]("severity")) ->
        (r.getAs[Long]("n_errors"), r.getAs[Long]("n_items"))).toMap
    assert(out(("gate", "soft")) == (5L, 5L))
    assert(out(("gate", "critical")) == (1L, 1L))
  }
}

object ErrSinkState {
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  val handled = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opened.set(0); handled.set(0); closed.set(0) }
}
