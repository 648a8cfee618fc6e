package graft.core

/** Per-record error channel, mirroring the reference's soft/critical error
  * model (reference: smartpipeline/error/exceptions.py:42-65,
  * smartpipeline/item.py:125-193). One `StageError` per captured failure.
  *
  * Unlike the reference (mutable lists on a Python object), errors ride as a
  * column-backed field so they survive shuffles and distributed execution.
  */
case class StageError(
    stage: String,
    severity: String, // "soft" | "critical" | "retry_exhausted"
    message: String,
    cause: String,
    attempts: Int
)

object StageError {
  val Soft = "soft"
  val Critical = "critical"
  val RetryExhausted = "retry_exhausted"
}

/** Raised by user stage code to mark a recoverable per-record failure: the
  * error is recorded and the record continues through later stages
  * (reference: error/exceptions.py:42-47, docs/usage.rst:106-111). */
class SoftError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Raised (or any unhandled exception) to mark an unrecoverable per-record
  * failure: the record skips all later stages but the job continues
  * (reference: error/exceptions.py:50-55, runners.py:29-30). */
class CriticalError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Pipeline-wide error policy (reference: error/handling.py:14-116).
  *  - SkipItem: critical error → record skips remaining stages (default).
  *  - NoSkip: treat critical like soft; record continues.
  *  - Raise: any critical error fails the whole job.
  */
sealed trait ErrorPolicy
object ErrorPolicy {
  case object SkipItem extends ErrorPolicy
  case object NoSkip extends ErrorPolicy
  case object Raise extends ErrorPolicy
}

/** Per-stage retry config with exponential backoff `2^(n-1) * backoff`
  * seconds (reference: runners.py:33-67, error/handling.py:119-149).
  * Retries happen per-record inside the stage wrapper — Spark's own
  * task-level retry (`spark.task.maxFailures`) is per-partition and stays
  * orthogonal.
  */
case class Retry(
    retryableErrors: Seq[Class[_ <: Throwable]] = Nil,
    maxRetries: Int = 0,
    backoffSeconds: Double = 0.0
) {
  require(maxRetries >= 0, "maxRetries must be >= 0")
  require(backoffSeconds >= 0, "backoff must be >= 0")
  def isRetryable(t: Throwable): Boolean =
    retryableErrors.exists(_.isInstance(t))
}
object Retry { val none: Retry = Retry() }
