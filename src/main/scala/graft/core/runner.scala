package graft.core

/** The per-record execution harness: critical-error gate, retry loop with
  * exponential backoff, timing capture, soft/critical classification
  * (reference: smartpipeline/runners.py:20-137, error/handling.py:55-149).
  *
  * Pure Scala (no Spark types) so the exact same semantics serve:
  *  - the distributed path (called inside `mapPartitions`),
  *  - the single-record sync path (`Pipeline.processOne`, reference
  *    pipeline.py:371-383),
  *  - streaming micro-batches.
  */
object StageRunner {

  /** Critical gate (reference: runners.py:29-30 via check_critical_errors):
    * a record that already carries a critical error skips later stages. */
  def shouldSkip[T](item: Tracked[T], policy: ErrorPolicy): Boolean =
    policy != ErrorPolicy.NoSkip && item.hasCriticalErrors

  /** Run one stage on one record under the full harness. */
  def runOne[T](
      stage: TypedStage[T],
      item: Tracked[T],
      policy: ErrorPolicy,
      retry: Retry
  ): Tracked[T] = {
    if (shouldSkip(item, policy)) return item
    val t0 = System.nanoTime()
    val out = attempt(stage.name, item, policy, retry)(stage.process)
    out.withTiming(stage.name, (System.nanoTime() - t0) / 1e9)
  }

  /** Run one stage on a batch (all-or-nothing error taint: a failure in
    * `processBatch` marks every record of the attempted batch — reference
    * runners.py:116-125, docs/usage.rst:108-111). Records already carrying
    * critical errors bypass the batch entirely (gate, runners.py:83-87). */
  def runBatch[T](
      stage: TypedBatchStage[T],
      batch: Seq[Tracked[T]],
      policy: ErrorPolicy,
      retry: Retry
  ): Seq[Tracked[T]] = {
    val (skipped, live) = batch.partition(shouldSkip(_, policy))
    if (live.isEmpty) return batch
    val t0 = System.nanoTime()
    val values = live.map(_.value)
    val processed: Either[StageError, Seq[T]] =
      try {
        val out = retryLoop(stage.name, retry)(() => stage.processBatch(values))
        if (out.length != values.length)
          Left(StageError(stage.name, StageError.Critical,
            s"batch stage returned ${out.length} records for ${values.length} inputs",
            "IllegalStateException", 1))
        else Right(out)
      } catch {
        case RetryExhaustedEx(e) => Left(e)
        case e: SoftError => Left(classify(stage.name, e, 1))
        case e: InterruptedException => throw e
        case e: Throwable =>
          if (policy == ErrorPolicy.Raise) throw e
          Left(classify(stage.name, e, 1))
      }
    // Per-item share of batch wall-clock (reference runners.py:101 divides
    // batch time evenly across the batch).
    val perItem = (System.nanoTime() - t0) / 1e9 / values.length
    val updated = processed match {
      case Right(out) =>
        live.zip(out).map { case (it, v) =>
          it.copy(value = v).withTiming(stage.name, perItem)
        }
      case Left(err) =>
        if (policy == ErrorPolicy.Raise && err.severity == StageError.Critical)
          throw new CriticalError(s"[${err.stage}] ${err.message}")
        live.map(_.withError(err).withTiming(stage.name, perItem))
    }
    skipped ++ updated
  }

  private case class RetryExhaustedEx(err: StageError) extends RuntimeException

  /** Retry loop: attempts 1..maxRetries+1, sleeping 2^(n-1)*backoff seconds
    * between attempts, only for configured retryable classes (reference:
    * runners.py:33-67). On exhaustion throws RetryExhaustedEx carrying a
    * `retry_exhausted` soft error (the reference attaches RetryError, a
    * SoftError subclass — error/exceptions.py:58-65). */
  private def retryLoop[A](stageName: String, retry: Retry)(f: () => A): A = {
    var attemptN = 1
    while (true) {
      try return f()
      catch {
        case e: Throwable if retry.isRetryable(e) && attemptN <= retry.maxRetries =>
          val sleepMs = (math.pow(2, attemptN - 1) * retry.backoffSeconds * 1000).toLong
          if (sleepMs > 0) Thread.sleep(sleepMs)
          attemptN += 1
        case e: Throwable if retry.isRetryable(e) =>
          throw RetryExhaustedEx(StageError(stageName, StageError.RetryExhausted,
            Option(e.getMessage).getOrElse(""), e.getClass.getSimpleName, attemptN))
      }
    }
    sys.error("unreachable")
  }

  private def classify(stageName: String, e: Throwable, attempts: Int): StageError = {
    val severity = e match {
      case _: SoftError => StageError.Soft
      case _ => StageError.Critical // any unhandled exception is critical
    }                               // (reference: handling.py:74-81)
    StageError(stageName, severity, Option(e.getMessage).getOrElse(""),
      e.getClass.getSimpleName, attempts)
  }

  private def attempt[T](
      stageName: String,
      item: Tracked[T],
      policy: ErrorPolicy,
      retry: Retry
  )(f: T => T): Tracked[T] =
    try item.copy(value = retryLoop(stageName, retry)(() => f(item.value)))
    catch {
      case RetryExhaustedEx(err) => item.withError(err)
      case e: SoftError => item.withError(classify(stageName, e, 1))
      case e: InterruptedException => throw e
      case e: Throwable =>
        if (policy == ErrorPolicy.Raise)
          throw new CriticalError(s"[$stageName] critical error", e)
        item.withError(classify(stageName, e, 1))
    }
}
