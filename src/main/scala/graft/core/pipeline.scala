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
    // generated lazily when the payload/meta don't carry one).
    var ds: Dataset[Tracked[T]] = src.mapPartitions { it =>
      it.map(v => Tracked(v))
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
      case _: ColumnarStage =>
        throw new IllegalArgumentException(
          "ColumnarStage belongs on FramePipeline (untyped surface)")
    }
  }

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
  * library (graft.operators, graft.functions) rides. */
final class FramePipeline private (
    source: Option[DataFrame],
    stages: Vector[ColumnarStage]
) {
  def setSource(df: DataFrame): FramePipeline = new FramePipeline(Some(df), stages)

  def append(name: String)(f: DataFrame => DataFrame): FramePipeline = {
    require(!stages.exists(_.name == name), s"stage name '$name' already used")
    new FramePipeline(source, stages :+ ColumnarStage(name)(f))
  }

  def stageNames: Seq[String] = stages.map(_.name)

  def build(): DataFrame = {
    val src = source.getOrElse(throw new IllegalStateException("no source set"))
    stages.foldLeft(src)((df, s) => s.transform(df))
  }
}

object FramePipeline {
  def apply(): FramePipeline = new FramePipeline(None, Vector.empty)
  def of(df: DataFrame): FramePipeline = FramePipeline().setSource(df)
}
