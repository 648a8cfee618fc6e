package graft.core

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

/** Items mirror the reference's RandomTextSource payload {text, count}
  * (reference: tests/utils.py:35-47); `count` is the unique completeness key
  * checked exactly-once-unordered, the reference's universal invariant
  * (tests/pipeline/test_concurrent.py:35-41). */
case class Doc(text: String, count: Int)

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def source(n: Int) =
    spark.createDataset((1 to n).map(i => Doc(s"text $i", i)))

  test("exactly-once unordered completeness through a multi-stage chain") {
    val out = Pipeline.of(source(100))
      .append("reverse")(d => d.copy(text = d.text.reverse))
      .append("dup")(d => d.copy(text = d.text + d.text))
      .build()
      .collect()
    assert(out.map(_.value.count).toSet == (1 to 100).toSet)
    assert(out.length == 100)
    assert(out.forall(_.errors.isEmpty))
  }

  test("consumer break: early close stops partition jobs, no orphaned work") {
    // reference parity: the run() generator's consumer may break mid-stream
    // and the pipeline tears down cleanly (pipeline.py:227-306,
    // test_concurrent.py:784-808). 60k rows over 8 partitions; consuming 10
    // must compute at most a couple of partitions, never the whole input.
    RunBreakState.processed.set(0)
    val handle = Pipeline.of(source(60000).repartition(8))
      .append("count_work") { d =>
        RunBreakState.processed.incrementAndGet(); d
      }
      .run()
    val got = handle.take(10).toVector
    assert(got.length == 10)
    handle.close()
    // the break is the teardown: remaining partitions' jobs never launched
    assert(RunBreakState.processed.get() < 30000,
      s"break still processed ${RunBreakState.processed.get()} of 60000 records")
    // no orphaned jobs: any in-flight job group cancels and drains
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 10_000_000_000L
    while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(tracker.getActiveJobIds().isEmpty, "active jobs survived the break")
    // closed handle is inert and close() is idempotent
    assert(!handle.hasNext)
    intercept[NoSuchElementException](handle.next())
    handle.close()
    // full consumption without a break still sees every record exactly once
    val all = Pipeline.of(source(1000))
      .append("id")(identity[Doc])
      .run()
    assert(all.map(_.value.count).toSet == (1 to 1000).toSet)
    all.close()
    // close() restores the caller's enclosing job group instead of
    // clearing it — a break inside a grouped computation must not strip
    // the outer group from the thread
    spark.sparkContext.setJobGroup("outer-group", "enclosing work")
    val inner = Pipeline.of(source(100)).append("id2")(identity[Doc]).run()
    inner.take(1).toVector
    inner.close()
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id") == "outer-group")
    // a FULLY DRAINED handle restores the prior group too — close() is not
    // required to end the group scope when hasNext has returned false
    val drained = Pipeline.of(source(50)).append("id3")(identity[Doc]).run()
    assert(drained.toVector.length == 50) // exhausts: hasNext -> false
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id") == "outer-group",
      "drained handle left its job group on the thread")
    spark.sparkContext.clearJobGroup()
  }

  test("soft error is recorded and the item continues through later stages") {
    val out = Pipeline.of(source(10))
      .append("soft") { d =>
        if (d.count % 2 == 0) throw new SoftError(s"even ${d.count}")
        d
      }
      .append("mark")(d => d.copy(text = "seen"))
      .build()
      .collect()
    assert(out.length == 10) // no item lost (docs/usage.rst:106-111)
    val failed = out.filter(_.errors.nonEmpty)
    assert(failed.map(_.value.count).toSet == Set(2, 4, 6, 8, 10))
    assert(failed.forall(_.errors.head.severity == StageError.Soft))
    // soft-failed items still ran the later stage
    assert(out.forall(_.value.text == "seen"))
  }

  test("critical error skips later stages for that item only") {
    val out = Pipeline.of(source(10))
      .append("crit") { d =>
        if (d.count == 3) throw new IllegalStateException("boom")
        d
      }
      .append("mark")(d => d.copy(text = "seen"))
      .build()
      .collect()
    assert(out.length == 10) // pipeline continues (docs/usage.rst:112-114)
    val bad = out.find(_.value.count == 3).get
    assert(bad.hasCriticalErrors)
    assert(bad.value.text == "text 3") // "mark" skipped (runners.py:29-30)
    assert(out.filter(_.value.count != 3).forall(_.value.text == "seen"))
  }

  test("NoSkip policy runs later stages even after a critical error") {
    val out = Pipeline.of(source(5))
      .noSkipOnCriticalError()
      .append("crit") { d =>
        if (d.count == 2) throw new IllegalStateException("boom")
        d
      }
      .append("mark")(d => d.copy(text = "seen"))
      .build()
      .collect()
    assert(out.find(_.value.count == 2).get.value.text == "seen")
  }

  test("Raise policy fails the whole run on critical error") {
    val p = Pipeline.of(source(5))
      .raiseOnCriticalError()
      .append("crit") { d =>
        if (d.count == 2) throw new IllegalStateException("boom")
        d
      }
      .build()
    intercept[org.apache.spark.SparkException](p.collect())
  }

  test("SoftError still soft under Raise policy") {
    val out = Pipeline.of(source(5))
      .raiseOnCriticalError()
      .append("soft") { d =>
        if (d.count == 2) throw new SoftError("meh")
        d
      }
      .build()
      .collect()
    assert(out.length == 5)
    assert(out.count(_.errors.nonEmpty) == 1)
  }

  test("retry: transient retryable errors succeed within maxRetries") {
    // Fails on the first 2 attempts per item, succeeds on the 3rd —
    // per-item attempt counters keyed by item id (single JVM in local mode).
    val out = Pipeline.of(source(4))
      .append(RetrySpecHelpers.flakyStage(failures = 2), StageOpts(
        retry = Retry(Seq(classOf[java.io.IOException]), maxRetries = 3)))
      .build()
      .collect()
    assert(out.length == 4)
    assert(out.forall(_.errors.isEmpty)) // all recovered
    assert(out.forall(_.value.text == "ok"))
  }

  test("retry exhaustion records retry_exhausted with attempt count; item survives") {
    val out = Pipeline.of(source(3))
      .append(RetrySpecHelpers.alwaysFailStage, StageOpts(
        retry = Retry(Seq(classOf[java.io.IOException]), maxRetries = 2)))
      .build()
      .collect()
    assert(out.length == 3)
    assert(out.forall(_.errors.head.severity == StageError.RetryExhausted))
    assert(out.forall(_.errors.head.attempts == 3)) // 1 initial + 2 retries
  }

  test("retry backoff sleeps 2^(n-1) * backoff between attempts") {
    // backoff=0.1s, 2 retries → sleeps 0.1 + 0.2 = 0.3s minimum
    // (reference timing-bound style, tests/pipeline/test_pipeline.py:398-430)
    val t0 = System.nanoTime()
    Pipeline.of(spark.createDataset(Seq(Doc("x", 1))))
      .append(RetrySpecHelpers.alwaysFailStage, StageOpts(
        retry = Retry(Seq(classOf[java.io.IOException]), maxRetries = 2, backoffSeconds = 0.1)))
      .build()
      .collect()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed >= 0.3, s"expected >= 0.3s of backoff, got $elapsed")
  }

  test("per-stage timings are recorded for visited stages only") {
    val out = Pipeline.of(source(5))
      .append("a")(identity)
      .append("crit") { d =>
        if (d.count == 1) throw new RuntimeException("x")
        d
      }
      .append("b")(identity)
      .build()
      .collect()
    val ok = out.find(_.value.count == 2).get
    assert(Set("a", "crit", "b").subsetOf(ok.timings.keySet))
    val bad = out.find(_.value.count == 1).get
    assert(bad.timings.contains("a") && bad.timings.contains("crit"))
    assert(!bad.timings.contains("b")) // skipped stage records no timing
  }

  test("batch stage: error taints the whole attempted batch") {
    // (reference: runners.py:116-125, docs/usage.rst:108-111)
    val out = Pipeline.of(source(40))
      .appendBatch(TypedBatchStage[Doc]("bulk", 10) { batch =>
        if (batch.exists(_.count == 5)) throw new SoftError("batch poisoned")
        batch.map(d => d.copy(text = "ok"))
      })
      .build()
      .collect()
    assert(out.length == 40)
    val failed = out.filter(_.errors.nonEmpty)
    assert(failed.nonEmpty)
    assert(failed.map(_.value.count).contains(5))
    assert(failed.forall(_.value.text != "ok")) // whole batch untransformed
    assert(out.filter(_.errors.isEmpty).forall(_.value.text == "ok"))
  }

  test("batch stage: size mismatch is a critical error") {
    val out = Pipeline.of(source(6))
      .appendBatch(TypedBatchStage[Doc]("bad", 3)(batch => batch.drop(1)))
      .build()
      .collect()
    assert(out.length == 6)
    assert(out.forall(_.hasCriticalErrors))
  }

  test("batch stage respects max batch size") {
    RetrySpecHelpers.batchSizes.clear()
    Pipeline.of(source(25).repartition(2))
      .appendBatch(TypedBatchStage[Doc]("sized", 10) { b =>
        RetrySpecHelpers.batchSizes.add(b.length); b
      })
      .build()
      .collect()
    import scala.jdk.CollectionConverters._
    // static state works because local-mode executors share the test JVM
    assert(RetrySpecHelpers.batchSizes.asScala.forall(_ <= 10))
    assert(RetrySpecHelpers.batchSizes.asScala.sum == 25)
  }

  test("onStart/onEnd fire once per partition") {
    RetrySpecHelpers.starts.set(0)
    RetrySpecHelpers.ends.set(0)
    val nParts = 3
    Pipeline.of(source(30).repartition(nParts))
      .append(RetrySpecHelpers.lifecycleStage)
      .build()
      .collect()
    assert(RetrySpecHelpers.starts.get() == nParts)
    assert(RetrySpecHelpers.ends.get() == nParts)
  }

  test("per-stage concurrency hint repartitions before the stage") {
    val out = Pipeline.of(source(20))
      .append(TypedStage[Doc]("count_parts") { d => d },
        StageOpts(concurrency = 7))
      .build()
    assert(out.rdd.getNumPartitions == 7)
    assert(out.count() == 20)
  }

  test("duplicate stage names are rejected") {
    intercept[IllegalArgumentException] {
      Pipeline.of(source(1)).append("a")(identity).append("a")(identity)
    }
  }

  test("synthesized ids are stable across re-executions (deterministic identity)") {
    // (partition, offset) ids: a task retry or a second run of the same plan
    // must see the same identity per record (reference item.py:96-110)
    val p = Pipeline.of(source(50)).append("noop")(identity)
    val run1 = p.build().collect().map(t => t.value.count -> t.id).sortBy(_._1)
    val run2 = p.build().collect().map(t => t.value.count -> t.id).sortBy(_._1)
    assert(run1.sameElements(run2))
    assert(run1.map(_._2).distinct.length == 50) // unique per record
  }

  test("processOne: synchronous single-record path matches cluster semantics") {
    val p = Pipeline[Doc](spark)
      .append("enrich")(d => d.copy(text = d.text + "!"))
      .append("crit") { d =>
        if (d.count == 9) throw new RuntimeException("no")
        d
      }
      .append("late")(d => d.copy(text = d.text + "?"))
    val ok = p.processOne(Doc("hi", 1))
    assert(ok.value.text == "hi!?")
    val bad = p.processOne(Doc("hi", 9))
    assert(bad.hasCriticalErrors && bad.value.text == "hi!")
  }

  test("FramePipeline chains named columnar stages") {
    import org.apache.spark.sql.functions._
    val df = source(10).toDF()
    val out = FramePipeline.of(df)
      .append("filter")(_.filter(col("count") > 5))
      .append("project")(_.select(col("count")))
      .build()
    assert(out.columns.toSeq == Seq("count"))
    assert(out.count() == 5)
  }

  private implicit class PipelineOps(p: Pipeline[Doc]) {
    def collect(): Array[Tracked[Doc]] = p.build().collect()
  }
}

/** `FramePipeline.appendSafe` error-harness semantics — the untyped mirror of
  * the typed Pipeline's O15–O17 contract (reference
  * tests/pipeline/test_pipeline.py:125-142: soft continues, critical skips
  * later stages, policies). */
class FramePipelineSafeSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def source(n: Int) =
    spark.createDataset((1 to n).map(i => Doc(s"text $i", i))).toDF()

  // schema after withErrorChannel: (text, count, _errors)
  private def errsOf(r: Row): Seq[Row] = r.getSeq[Row](r.fieldIndex("_errors"))

  test("appendSafe: soft error is recorded and the row continues through later stages") {
    val out = FramePipeline.of(source(10))
      .appendSafe("soft") { r =>
        if (r.getInt(1) % 2 == 0) throw new SoftError(s"even ${r.getInt(1)}")
        Row(r.getString(0).toUpperCase, r.getInt(1), r.get(2))
      }
      .appendSafe("mark")(r => Row(r.getString(0) + "|seen", r.getInt(1), r.get(2)))
      .build().collect()
    assert(out.length == 10) // no row lost
    val bad = out.filter(r => errsOf(r).nonEmpty)
    assert(bad.map(_.getAs[Int]("count")).toSet == Set(2, 4, 6, 8, 10))
    assert(bad.forall(r => errsOf(r).head.getString(1) == StageError.Soft))
    assert(bad.forall(r => errsOf(r).head.getString(0) == "soft")) // stage name recorded
    // soft-failed rows kept their input text (stage output discarded) but
    // still ran the later "mark" stage
    assert(bad.forall(r => r.getAs[String]("text").startsWith("text ")
      && r.getAs[String]("text").endsWith("|seen")))
    assert(out.filter(r => errsOf(r).isEmpty)
      .forall(_.getAs[String]("text").startsWith("TEXT")))
  }

  test("appendSafe: critical error skips later safe stages but not columnar ones") {
    val out = FramePipeline.of(source(10))
      .appendSafe("crit") { r =>
        if (r.getInt(1) == 3) throw new IllegalStateException("boom")
        r
      }
      .appendSafe("mark")(r => Row(r.getString(0) + "|m", r.getInt(1), r.get(2)))
      .append("flag")(_.withColumn("flag", lit(1)))
      .build().collect()
    assert(out.length == 10) // pipeline continues
    val bad = out.find(_.getAs[Int]("count") == 3).get
    assert(errsOf(bad).head.getString(1) == StageError.Critical)
    assert(bad.getAs[String]("text") == "text 3") // "mark" skipped for this row
    assert(bad.getAs[Int]("flag") == 1) // whole-frame stage cannot be skipped per row
    assert(out.filter(_.getAs[Int]("count") != 3)
      .forall(_.getAs[String]("text").endsWith("|m")))
  }

  test("appendSafe: NoSkip policy runs later safe stages after a critical error") {
    val out = FramePipeline.of(source(5))
      .errorPolicy(ErrorPolicy.NoSkip)
      .appendSafe("crit") { r =>
        if (r.getInt(1) == 2) throw new RuntimeException("x")
        r
      }
      .appendSafe("mark")(r => Row(r.getString(0) + "|m", r.getInt(1), r.get(2)))
      .build().collect()
    assert(out.find(_.getAs[Int]("count") == 2).get.getAs[String]("text") == "text 2|m")
    assert(out.find(_.getAs[Int]("count") == 2).exists(r => errsOf(r).nonEmpty))
  }

  test("appendSafe: Raise policy fails the job on critical error; SoftError stays soft") {
    val failing = FramePipeline.of(source(5))
      .errorPolicy(ErrorPolicy.Raise)
      .appendSafe("crit") { r =>
        if (r.getInt(1) == 2) throw new RuntimeException("x")
        r
      }
      .build()
    intercept[org.apache.spark.SparkException](failing.collect())
    val soft = FramePipeline.of(source(5))
      .errorPolicy(ErrorPolicy.Raise)
      .appendSafe("soft") { r =>
        if (r.getInt(1) == 2) throw new SoftError("meh")
        r
      }
      .build().collect()
    assert(soft.length == 5)
    assert(soft.count(r => errsOf(r).nonEmpty) == 1)
  }

  test("fromTyped bridges a typed pipeline into FramePipeline with one shared error channel") {
    val typed = Pipeline.of(spark.createDataset((1 to 6).map(i => Doc(s"text $i", i))))
      .append("typed_soft") { d =>
        if (d.count == 2) throw new SoftError("typed says no"); d
      }
      .build()
    val out = FramePipeline.of(FramePipeline.fromTyped(typed))
      .appendSafe("frame_soft") { r =>
        if (r.getInt(r.fieldIndex("count")) == 5) throw new SoftError("frame says no")
        r
      }
      .append("columnar")(_.withColumn("flag", lit(true)))
      .build().collect()
    assert(out.length == 6)
    def errs(c: Int) = out.find(_.getAs[Int]("count") == c).get
      .getSeq[Row](out.head.fieldIndex("_errors"))
      .map(e => (e.getString(0), e.getString(1)))
    assert(errs(2) == Seq(("typed_soft", StageError.Soft))) // typed error survived the bridge
    assert(errs(5) == Seq(("frame_soft", StageError.Soft))) // frame stage appended to the SAME channel
    assert(errs(1).isEmpty)
    // ids and timings crossed over too
    assert(out.forall(r => r.getAs[String]("_id") != null))
    assert(out.forall(r => r.getMap[String, Double](r.fieldIndex("_timings"))
      .contains("typed_soft")))
  }

  test("appendSafe: harness owns _errors — stage writes there are ignored, prior errors carried") {
    val out = FramePipeline.of(source(4))
      .appendSafe("soft") { r =>
        if (r.getInt(1) == 1) throw new SoftError("first")
        r
      }
      .appendSafe("tamper")(r =>
        Row(r.getString(0), r.getInt(1), Seq(Row("fake", "critical", "m", "", 9))))
      .build().collect()
    val one = out.find(_.getAs[Int]("count") == 1).get
    // the tampered value was discarded: row 1 carries exactly its one real
    // soft error from the earlier stage, everyone else none
    assert(errsOf(one).map(e => (e.getString(0), e.getString(1)))
      == Seq(("soft", StageError.Soft)))
    assert(out.filter(_.getAs[Int]("count") != 1).forall(r => errsOf(r).isEmpty))
  }
}

/** Stage helpers with JVM-static state (valid in local mode: executors share
  * the test JVM). */
object RetrySpecHelpers {
  val starts = new AtomicInteger(0)
  val ends = new AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  private val attempts = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()

  def flakyStage(failures: Int): TypedStage[Doc] = new TypedStage[Doc] {
    val name = "flaky"
    def process(d: Doc): Doc = {
      val n = attempts.computeIfAbsent(d.count, _ => new AtomicInteger(0)).incrementAndGet()
      if (n <= failures) throw new java.io.IOException(s"transient $n")
      d.copy(text = "ok")
    }
  }

  val alwaysFailStage: TypedStage[Doc] = new TypedStage[Doc] {
    val name = "always_fail"
    def process(d: Doc): Doc = throw new java.io.IOException("permanent")
  }

  val lifecycleStage: TypedStage[Doc] = new TypedStage[Doc] {
    val name = "lifecycle"
    override def onStart(): Unit = { starts.incrementAndGet(); () }
    override def onEnd(): Unit = { ends.incrementAndGet(); () }
    def process(d: Doc): Doc = d
  }
}

object RunBreakState {
  val processed = new AtomicInteger(0)
}
