package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Per-stage execution options.
  *
  * `concurrency` mirrors the reference's per-stage worker count
  * (reference: pipeline.py:548-587). On Spark the degree of parallelism is
  * partitions × cores, so a positive value becomes an explicit
  * `repartition(n)` hint before the stage — off by default because an extra
  * shuffle is rarely worth it; Spark's scheduler already load-balances. The
  * reference's thread-vs-process `parallel` flag has no JVM analog (executors
  * are processes; no GIL) and is intentionally absent.
  */
case class StageOpts(retry: Retry = Retry.none, concurrency: Int = 0)

/** Typed, error-harnessed pipeline — the Spark re-expression of the
  * reference's `Pipeline` (reference: smartpipeline/pipeline.py).
  *
  * Builder calls assemble a linear chain of named stages (the reference's
  * ordered container dict, pipeline.py:67); `build()` materializes it as a
  * lazy `Dataset[Tracked[T]]` transformation chain — Spark's logical plan IS
  * the pipeline plan, and Catalyst/AQE replace the reference's hand-rolled
  * queue/worker execution (SURVEY.md §3.1).
  *
  * Divergences (documented, semantics-compatible):
  *  - No ordering guarantee under parallelism — same as the reference, whose
  *    tests only assert set-completeness (test_concurrent.py:35-41).
  *  - `append_concurrently` (async stage construction) is unnecessary: Spark
  *    plans are lazy and heavy init belongs in `onStart`/executor singletons.
  *  - Stop/termination protocol: bounded jobs end naturally; streaming uses
  *    `StreamingQuery.stop()`.
  */
final class Pipeline[T] private (
    val spark: SparkSession,
    source: Option[Dataset[T]],
    stages: Vector[(AnyStage, StageOpts)],
    policy: ErrorPolicy
) {

  private def copyWith(
      source: Option[Dataset[T]] = source,
      stages: Vector[(AnyStage, StageOpts)] = stages,
      policy: ErrorPolicy = policy
  ) = new Pipeline[T](spark, source, stages, policy)

  def setSource(ds: Dataset[T]): Pipeline[T] = copyWith(source = Some(ds))

  def errorPolicy(p: ErrorPolicy): Pipeline[T] = copyWith(policy = p)

  /** Fail the whole run on any critical error (reference:
    * handling.py:22-28 raise_on_critical_error). */
  def raiseOnCriticalError(): Pipeline[T] = errorPolicy(ErrorPolicy.Raise)

  /** Treat critical errors like soft ones (reference: handling.py:30-37). */
  def noSkipOnCriticalError(): Pipeline[T] = errorPolicy(ErrorPolicy.NoSkip)

  def append(stage: TypedStage[T], opts: StageOpts = StageOpts()): Pipeline[T] = {
    requireUniqueName(stage.name)
    copyWith(stages = stages :+ (stage, opts))
  }

  def append(name: String)(f: T => T): Pipeline[T] =
    append(TypedStage(name)(f))

  def appendBatch(stage: TypedBatchStage[T], opts: StageOpts = StageOpts()): Pipeline[T] = {
    requireUniqueName(stage.name)
    copyWith(stages = stages :+ (stage, opts))
  }

  def stageNames: Seq[String] = stages.map(_._1.name)

  private def requireUniqueName(name: String): Unit =
    require(!stages.exists(_._1.name == name),
      s"stage name '$name' already used (reference: pipeline.py:711-717)")

  /** Materialize the chain as a lazy Dataset. Nothing executes until an
    * action — `build()` is the reference's `build()` + the analysis step. */
  def build()(implicit enc: Encoder[Tracked[T]]): Dataset[Tracked[T]] = {
    val src = source.getOrElse(throw new IllegalStateException("no source set"))
    require(stages.nonEmpty, "pipeline needs at least one stage")
    // Synthesize stable ids at the source (reference item.py:96-110: ids are
    // generated lazily when the payload/meta don't carry one). The id is
    // (partitionId, offset) — deterministic across task retries and re-runs
    // for any deterministic source partitioning (file scans are), so a task
    // retry can never mint a second identity for the same record the way a
    // per-record UUID would. Source-driven ids stay on `Tracked.withId`.
    var ds: Dataset[Tracked[T]] = src.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var off = -1L
      it.map { v => off += 1; Tracked.withId(v, s"$pid-$off") }
    }
    for ((stage, opts) <- stages) {
      if (opts.concurrency > 0) ds = ds.repartition(opts.concurrency)
      ds = applyStage(ds, stage, opts)
    }
    ds
  }

  private def applyStage(
      ds: Dataset[Tracked[T]],
      stage: AnyStage,
      opts: StageOpts
  )(implicit enc: Encoder[Tracked[T]]): Dataset[Tracked[T]] = {
    val pol = policy
    stage match {
      case s: TypedStage[T @unchecked] =>
        ds.mapPartitions { it =>
          s.onStart() // per-partition lifecycle (reference runners.py:168-177)
          Pipeline.completing(it.map(StageRunner.runOne(s, _, pol, opts.retry)),
            () => s.onEnd())
        }
      case s: TypedBatchStage[T @unchecked] =>
        ds.mapPartitions { it =>
          s.onStart()
          Pipeline.completing(
            it.grouped(s.size).flatMap(StageRunner.runBatch(s, _, pol, opts.retry)),
            () => s.onEnd())
        }
      case _: ColumnarStage | _: SafeRowStage =>
        throw new IllegalArgumentException(
          "ColumnarStage/SafeRowStage belong on FramePipeline (untyped surface)")
    }
  }

  /** Consumer-driven run — the reference's `for item in pipeline.run()`
    * WITH break support (reference pipeline.py:227-306; consumer-break
    * teardown test_concurrent.py:784-808): the output comes back as a
    * lazily-fetched local iterator, computing one partition's job at a time
    * as the consumer pulls. Breaking early — `close()`, or simply
    * abandoning the handle — never launches the remaining partitions'
    * jobs, and `close()` additionally cancels the in-flight partition job
    * via its job group, so no orphaned work survives the break. The
    * thread's prior job group is restored on `close()` AND on full drain;
    * only abandoning a half-drained handle without `close()` leaves the
    * handle's group set on the thread.
    *
    * The job group rides the CALLING thread's local properties (Spark's
    * contract), so pull from the thread that called `run()`. Bulk
    * consumption belongs on the Dataset actions (`build().write...`) —
    * this is the incremental/interactive path. */
  def run()(implicit enc: Encoder[Tracked[T]]): RunHandle[T] =
    new RunHandle(build(), s"graft-run-${java.util.UUID.randomUUID()}")

  /** Synchronous single-record path, no cluster round-trip (reference:
    * pipeline.py:371-383 `process`). Runs the exact same StageRunner
    * semantics driver-side — the debug/serving path. */
  def processOne(value: T): Tracked[T] = {
    var item = Tracked(value)
    for ((stage, opts) <- stages) {
      stage match {
        case s: TypedStage[T @unchecked] =>
          s.onStart()
          item = StageRunner.runOne(s, item, policy, opts.retry)
          s.onEnd()
        case s: TypedBatchStage[T @unchecked] =>
          s.onStart()
          item = StageRunner.runBatch(s, Seq(item), policy, opts.retry).head
          s.onEnd()
        case _ => ()
      }
    }
    item
  }
}

/** Closeable consumption handle returned by [[Pipeline.run]]: an Iterator
  * over the pipeline output whose `close()` is the reference's consumer
  * `break` — cancels the in-flight partition job (the job group is created
  * with interrupt-on-cancel) and RESTORES the calling thread's previous
  * job group (not a blanket clear, so an enclosing group survives the
  * break). Jobs the caller launches between `next()` calls on the same
  * thread share the handle's group — Spark's thread-local contract — so
  * interleave unrelated actions from another thread if they must not be
  * cancellable by `close()`. Idempotent; a closed handle reports
  * `hasNext = false`. */
final class RunHandle[T] private[core] (ds: Dataset[Tracked[T]], group: String)
    extends Iterator[Tracked[T]] with AutoCloseable {
  private val sc = ds.sparkSession.sparkContext
  private val priorGroup = sc.getLocalProperty("spark.jobGroup.id")
  private val priorDesc = sc.getLocalProperty("spark.job.description")
  private val priorInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
  sc.setJobGroup(group, "graft pipeline consumer-driven run",
    interruptOnCancel = true)
  private val it = ds.toLocalIterator()
  @volatile private var closed = false
  private var restored = false
  // Thread-local properties, so restoration must happen on the consuming
  // thread — which full drain (hasNext -> false) and the common same-thread
  // close() both satisfy. Restoring on exhaustion means a fully-drained
  // handle ends its group scope without requiring close(); abandoning a
  // half-drained handle without close() is the one path that leaks the
  // group onto the thread.
  private def restore(): Unit = synchronized {
    if (!restored) {
      restored = true
      sc.setLocalProperty("spark.jobGroup.id", priorGroup)
      sc.setLocalProperty("spark.job.description", priorDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", priorInterrupt)
    }
  }
  def hasNext: Boolean = {
    if (closed) false
    else {
      val h = it.hasNext
      if (!h) restore() // drained: end the group scope for this thread
      h
    }
  }
  def next(): Tracked[T] = {
    if (closed) throw new NoSuchElementException("handle closed")
    it.next()
  }
  def close(): Unit = if (!closed) {
    closed = true
    sc.cancelJobGroup(group)
    restore()
  }
}

object Pipeline {
  def apply[T](spark: SparkSession): Pipeline[T] =
    new Pipeline[T](spark, None, Vector.empty, ErrorPolicy.SkipItem)

  def of[T](source: Dataset[T]): Pipeline[T] =
    apply[T](source.sparkSession).setSource(source)

  /** Wrap an iterator so `onEnd` fires exactly once after exhaustion.
    * Static (not a Pipeline method) so task closures don't capture the
    * builder — which holds the non-serializable SparkSession. */
  private[core] def completing[A](it: Iterator[A], onEnd: () => Unit): Iterator[A] =
    new Iterator[A] {
      private var ended = false
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !ended) { ended = true; onEnd() }
        h
      }
      def next(): A = it.next()
    }
}

/** Untyped relational pipeline: a named, ordered chain of pure
  * `DataFrame => DataFrame` stages. Because every stage is Column-expression
  * based, Catalyst optimizes across stage boundaries (pushdown, pruning,
  * join planning) — this is the surface on which the relational operator
  * library (graft.operators, graft.functions) rides.
  *
  * Error semantics on this surface (O15–O17 parity with the typed path):
  *  - `append` stages are pure Column-expression transforms; a failure there
  *    is structural (wrong schema/type), not a data error, so they stay
  *    fail-fast. Use Spark's `try_*` functions for value-level partiality.
  *  - `appendSafe` stages run opaque per-row code under the same error
  *    harness as the typed Pipeline: a [[SoftError]] is recorded in the
  *    reserved `_errors` array column and the row continues; any other
  *    exception is critical — under [[ErrorPolicy.SkipItem]] the row skips
  *    all later `appendSafe` stages (columnar stages still see it — a
  *    whole-frame transform cannot be skipped per row), under
  *    [[ErrorPolicy.NoSkip]] it continues, under [[ErrorPolicy.Raise]] the
  *    job fails.
  */
final class FramePipeline private (
    source: Option[DataFrame],
    stages: Vector[AnyStage],
    policy: ErrorPolicy
) {
  def setSource(df: DataFrame): FramePipeline =
    new FramePipeline(Some(df), stages, policy)

  def errorPolicy(p: ErrorPolicy): FramePipeline =
    new FramePipeline(source, stages, p)

  def append(name: String)(f: DataFrame => DataFrame): FramePipeline = {
    requireUnique(name)
    new FramePipeline(source, stages :+ ColumnarStage(name)(f), policy)
  }

  /** Error-harnessed opaque row stage: `f` must return a row with the same
    * schema (record→record enrichment); the harness owns the `_errors`
    * field — new errors are appended, and whatever `f` wrote there is
    * ignored. */
  def appendSafe(name: String)(f: org.apache.spark.sql.Row => org.apache.spark.sql.Row): FramePipeline = {
    requireUnique(name)
    new FramePipeline(source, stages :+ SafeRowStage(name)(f), policy)
  }

  private def requireUnique(name: String): Unit =
    require(!stages.exists(_.name == name), s"stage name '$name' already used")

  def stageNames: Seq[String] = stages.map(_.name)

  def build(): DataFrame = {
    val src = source.getOrElse(throw new IllegalStateException("no source set"))
    stages.foldLeft(src) {
      case (df, s: ColumnarStage) => s.transform(df)
      case (df, s: SafeRowStage)  => FramePipeline.runSafe(df, s, policy)
      case (_, s) => throw new IllegalArgumentException(
        s"stage '${s.name}' is not a frame stage")
    }
  }
}

object FramePipeline {
  import org.apache.spark.sql.{Encoders, Row}
  import org.apache.spark.sql.functions.array
  import org.apache.spark.sql.types._

  def apply(): FramePipeline =
    new FramePipeline(None, Vector.empty, ErrorPolicy.SkipItem)
  def of(df: DataFrame): FramePipeline = FramePipeline().setSource(df)

  /** Row-level error struct for the reserved `_errors` column — the untyped
    * rendering of [[StageError]]. */
  val errorFieldSchema: StructType = StructType(Seq(
    StructField("stage", StringType),
    StructField("severity", StringType),
    StructField("message", StringType),
    StructField("cause", StringType),
    StructField("attempts", IntegerType)))

  /** Add an empty `_errors` column if the frame doesn't carry one yet. */
  def withErrorChannel(df: DataFrame): DataFrame =
    if (df.columns.contains(ItemColumns.Errors)) df
    else df.withColumn(ItemColumns.Errors,
      array().cast(ArrayType(errorFieldSchema)))

  /** Bridge from the typed surface: flatten a `Dataset[Tracked[T]]` into the
    * reserved-column representation (`_id`/`_meta`/`_timings`/`_errors` +
    * the value's columns), so a typed pipeline's output continues through
    * FramePipeline stages with ONE shared error channel — the reference's
    * single Item model seen from both APIs. `StageError`'s encoder layout
    * matches [[errorFieldSchema]] field-for-field, so `appendSafe` stages
    * append to the same array the typed harness wrote. */
  def fromTyped[T](ds: org.apache.spark.sql.Dataset[Tracked[T]]): DataFrame = {
    val df = ds.toDF()
    val valueCols = df.schema("value").dataType match {
      case st: StructType =>
        // The value struct expands with `value.*`; a field named like a
        // reserved harness column would collide and make every downstream
        // appendSafe resolution ambiguous — refuse up front (mirror of the
        // asofJoin payload-collision check).
        val clash = st.fieldNames.toSet.intersect(ItemColumns.all.toSet)
        require(clash.isEmpty,
          s"fromTyped: value struct fields ${clash.mkString(", ")} collide " +
            s"with reserved harness columns (${ItemColumns.all.mkString(", ")})")
        Seq(org.apache.spark.sql.functions.col("value.*"))
      case _ => Seq(org.apache.spark.sql.functions.col("value"))
    }
    import org.apache.spark.sql.functions.col
    df.select(valueCols ++ Seq(
      col("id").as(ItemColumns.Id),
      col("meta").as(ItemColumns.Meta),
      col("timings").as(ItemColumns.Timings),
      col("errors").as(ItemColumns.Errors)): _*)
  }

  private def runSafe(df0: DataFrame, s: SafeRowStage, policy: ErrorPolicy): DataFrame = {
    val df = withErrorChannel(df0)
    val schema = df.schema
    val errIdx = schema.fieldIndex(ItemColumns.Errors)
    val stageName = s.name
    val f = s.f
    df.mapPartitions { rows =>
      rows.map { r =>
        val errs = r.getSeq[Row](errIdx)
        val isCritical =
          errs != null && errs.exists(e => e.getString(1) == StageError.Critical)
        def withErr(severity: String, t: Throwable): Row = {
          val cause = if (t.getCause == null) "" else t.getCause.toString
          val e = Row(stageName, severity, String.valueOf(t.getMessage), cause, 1)
          Row.fromSeq(r.toSeq.updated(errIdx, (if (errs == null) Nil else errs) :+ e))
        }
        if (isCritical && policy == ErrorPolicy.SkipItem) r
        else
          try {
            val out = f(r)
            // the harness owns the error channel: carry the input's errors
            Row.fromSeq(out.toSeq.updated(errIdx, errs))
          } catch {
            case e: SoftError => withErr(StageError.Soft, e)
            case e: Throwable if policy != ErrorPolicy.Raise =>
              withErr(StageError.Critical, e)
          }
      }
    }(Encoders.row(schema))
  }
}
