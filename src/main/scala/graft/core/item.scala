package graft.core

/** The engine's record wrapper — the Spark re-expression of the reference's
  * `Item` (reference: smartpipeline/item.py:12-193). The payload is `value: T`
  * (ordinary typed columns once encoded); the out-of-band compartments ride
  * alongside:
  *
  *  - `id`       — stable identity (item.py:96-110: payload id → meta id →
  *                 generated); here synthesized by the source when absent.
  *  - `meta`     — out-of-band descriptors (item.py:50-72).
  *  - `timings`  — stage name → seconds (item.py:74-94).
  *  - `errors`   — soft/critical channel (item.py:125-193).
  *
  * Encoded as a Spark struct row `(value, id, meta, timings, errors)`; all
  * engine wrappers preserve the non-payload compartments.
  */
case class Tracked[T](
    value: T,
    id: String,
    meta: Map[String, String],
    timings: Map[String, Double],
    errors: Seq[StageError]
) {
  def softErrors: Seq[StageError] =
    errors.filterNot(_.severity == StageError.Critical)
  def criticalErrors: Seq[StageError] =
    errors.filter(_.severity == StageError.Critical)
  def hasCriticalErrors: Boolean = errors.exists(_.severity == StageError.Critical)
  def timing(stage: String): Option[Double] = timings.get(stage)

  def withError(e: StageError): Tracked[T] = copy(errors = errors :+ e)
  def withTiming(stage: String, seconds: Double): Tracked[T] =
    copy(timings = timings + (stage -> seconds))
  def mapValue(f: T => T): Tracked[T] = copy(value = f(value))
}

object Tracked {
  /** Ad-hoc wrapper with a random id — driver-side paths only (processOne /
    * AsyncRunner), where there are no task retries to re-mint ids under. The
    * distributed path (`Pipeline.build`) assigns deterministic
    * (partition, offset) ids instead. */
  def apply[T](value: T): Tracked[T] =
    Tracked(value, java.util.UUID.randomUUID().toString, Map.empty, Map.empty, Nil)
  def withId[T](value: T, id: String): Tracked[T] =
    Tracked(value, id, Map.empty, Map.empty, Nil)
}

/** Reserved column names when the same compartments are represented
  * directly on a DataFrame (untyped surface) instead of a Tracked[T]. */
object ItemColumns {
  val Id = "_id"
  val Meta = "_meta"
  val Timings = "_timings"
  val Errors = "_errors"
  val all: Seq[String] = Seq(Id, Meta, Timings, Errors)
}
