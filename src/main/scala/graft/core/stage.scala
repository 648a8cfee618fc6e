package graft.core

import org.apache.spark.sql.DataFrame

/** Stage algebra — the Spark re-expression of the reference's `Stage` /
  * `BatchStage` (reference: smartpipeline/stage.py:37-116).
  *
  * Two flavors, per SURVEY.md §7.1:
  *  - [[ColumnarStage]]: pure `DataFrame => DataFrame` built from Column
  *    expressions. Catalyst keeps optimizing through these (pushdown,
  *    pruning, codegen) — the preferred flavor for anything relational.
  *  - [[TypedStage]] / [[TypedBatchStage]]: opaque user record→record code,
  *    wrapped by the error/retry/timing harness ([[StageRunner]]) via typed
  *    `map`/`mapPartitions`. These are optimization barriers, exactly as the
  *    reference's opaque Python callables are — reserve for genuinely
  *    imperative logic.
  */
sealed trait AnyStage { def name: String }

/** Pure relational stage: Column-expression transformations only.
  * Catalyst sees through it; errors cannot be captured per-record here
  * (expressions should be total — use try_* functions for partial ones). */
final case class ColumnarStage(name: String)(val transform: DataFrame => DataFrame)
    extends AnyStage

/** Opaque per-row stage on the untyped surface, run under the error
  * harness by [[FramePipeline.appendSafe]]: failures land in the reserved
  * `_errors` column instead of failing the job. */
final case class SafeRowStage(name: String)(
    val f: org.apache.spark.sql.Row => org.apache.spark.sql.Row)
    extends AnyStage

/** Opaque per-record stage (reference: stage.py:55-64). Lifecycle hooks
  * `onStart`/`onEnd` run once per partition (reference on_start/on_end per
  * worker copy, stage.py:37-52, runners.py:168-177). */
trait TypedStage[T] extends AnyStage with Serializable {
  def name: String
  /** Called once per partition before the first record. Heavy non-serializable
    * state (clients, models) belongs here or in a lazy executor singleton. */
  def onStart(): Unit = ()
  /** Called once per partition after the last record. */
  def onEnd(): Unit = ()
  def process(value: T): T
}

object TypedStage {
  def apply[T](stageName: String)(f: T => T): TypedStage[T] = new TypedStage[T] {
    val name: String = stageName
    def process(value: T): T = f(value)
  }
}

/** Opaque batch stage (reference: stage.py:67-76, 88-116): batches of at most
  * `size` records per `processBatch` call, amortizing per-call costs (bulk
  * HTTP, batched model inference). Implemented as partition-local grouping —
  * batch composition is an execution detail, exactly as in the reference
  * (SURVEY.md §2 notes: nondeterministic under concurrency).
  *
  * The reference's `timeout` flush only matters for unbounded/slow sources; in
  * batch execution partitions are drained eagerly so it is a no-op, and in
  * streaming the micro-batch trigger interval plays that role.
  */
trait TypedBatchStage[T] extends AnyStage with Serializable {
  def name: String
  def size: Int
  def onStart(): Unit = ()
  def onEnd(): Unit = ()
  /** Must return exactly one output per input, in order (the reference's
    * batch stages are 1→1 per item; a size mismatch is a critical error
    * applied to the whole batch). */
  def processBatch(values: Seq[T]): Seq[T]
}

object TypedBatchStage {
  def apply[T](stageName: String, batchSize: Int)(f: Seq[T] => Seq[T]): TypedBatchStage[T] =
    new TypedBatchStage[T] {
      val name: String = stageName
      val size: Int = batchSize
      def processBatch(values: Seq[T]): Seq[T] = f(values)
    }
}
