package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability — the Spark re-expression of the reference's
  * counters and error-manager sink.
  *
  *  - `observed`: `pipeline.count` parity (reference pipeline.py:308-315,
  *    containers.py:112-122). Accumulators are at-least-once under task
  *    retry, so correctness-grade counts use `Dataset.observe` metrics,
  *    which Spark de-duplicates per task (SURVEY.md §7.3).
  *  - `errorsOf` / error sinks: the pluggable ErrorManager surface
  *    (reference error/handling.py:14-116; ES-logging example
  *    docs/usage.rst:230-252): the error channel is just a column, so a
  *    sink is any DataFrame writer over the flattened error rows.
  */
object PipelineMetrics {

  /** Attach observed metrics to a pipeline output: total items, items with
    * any error, items with critical errors. Read `obs.get` after an action. */
  def observed[T](ds: Dataset[Tracked[T]], name: String = "graft_pipeline")
      : (Dataset[Tracked[T]], Observation) = {
    val obs = Observation(name)
    val observedDs = ds.observe(obs,
      count(lit(1)).as("n_items"),
      sum(when(size(col("errors")) > 0, 1L).otherwise(0L)).as("n_failed"),
      sum(when(exists(col("errors"), e => e.getField("severity") === StageError.Critical),
        1L).otherwise(0L)).as("n_critical"))
    (observedDs, obs)
  }

  /** One row per captured error: (id, stage, severity, message, cause,
    * attempts) — the shape an error sink (table, ES index, log) consumes. */
  def errorsOf[T](ds: Dataset[Tracked[T]]): DataFrame =
    ds.filter(size(col("errors")) > 0)
      .select(col("id"), explode(col("errors")).as("e"))
      .select(col("id"), col("e.stage").as("stage"),
        col("e.severity").as("severity"), col("e.message").as("message"),
        col("e.cause").as("cause"), col("e.attempts").as("attempts"))

  /** Route captured errors to a parquet table — a ready-made error sink
    * (swap for any writer). */
  def sinkErrors[T](ds: Dataset[Tracked[T]], path: String): Unit =
    errorsOf(ds).write.mode("append").parquet(path)

  /** ErrorManager-style push sink with a connection lifecycle (reference
    * error/handling.py:39-53: the pluggable manager's `on_start` opens its
    * sink connection before any error is handled, `on_end` closes it after
    * the last): `onStart` runs once per partition and returns the
    * connection, `handle` sees each flattened error row
    * ([[errorsOf]] shape), `onEnd` closes the connection — guaranteed via
    * finally even when a handler throws, so connections never leak. Same
    * per-partition contract as `Sinks.foreachSink` (the ES-indexer shape),
    * applied to the error channel. */
  def foreachErrorSink[T, C](ds: Dataset[Tracked[T]])(onStart: () => C)(
      handle: (C, org.apache.spark.sql.Row) => Unit)(onEnd: C => Unit): Unit =
    graft.sources.Sinks.foreachSink(errorsOf(ds))(onStart)(handle)(onEnd)

  /** Per-stage latency summary across all records: (stage, n, total_s,
    * mean_s, p95_s) — the ops rollup of the per-record `timings` the
    * runner writes (reference exposes per-item timings only; this is the
    * fleet view). One explode + one aggregation; percentile is the exact
    * discrete one, deterministic for the oracle-style checks. */
  def timingSummary[T](ds: Dataset[Tracked[T]]): DataFrame =
    ds.select(explode(col("timings")).as(Seq("stage", "secs")))
      .groupBy("stage")
      .agg(count(lit(1)).as("n"),
        sum(col("secs")).as("total_s"),
        avg(col("secs")).as("mean_s"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY secs)").as("p95_s"))

  /** Error rollup by (stage, severity): counts + retry totals — the
    * monitoring view over [[errorsOf]]'s row stream. */
  def errorSummary[T](ds: Dataset[Tracked[T]]): DataFrame =
    errorsOf(ds)
      .groupBy("stage", "severity")
      .agg(count(lit(1)).as("n_errors"),
        sum(col("attempts")).as("total_attempts"),
        countDistinct(col("id")).as("n_items"))

  /** Truncated payload repr for logs (reference item.py:42-48
    * `data_snippet`, DATA_SNIPPET_SIZE=100, defaults.py:4). */
  def dataSnippet[T](item: Tracked[T], maxSize: Int = 100): String = {
    val s = String.valueOf(item.value)
    if (s.length <= maxSize) s else s.substring(0, maxSize) + "…"
  }
}
