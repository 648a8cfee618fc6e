package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval time-series resampling with gap fill and
  * last-observation-carried-forward — the feature-engineering step that
  * turns an irregular event stream into the dense per-key grid a trainer
  * or monitor consumes (hourly activity vectors, sensor panels, feature
  * snapshots). The reference pipeline's per-item processing has no grid
  * concept; this is the engine-native densification of its event streams
  * (cf. reference `stage.py` per-record map — here the "record" is a
  * (key, bucket) cell that may not exist in the input at all).
  *
  * == Semantics ==
  *
  * Buckets are epoch-microsecond intervals of `stepMicros` (timezone-free
  * integer division, so the grid replays identically on any engine).
  * For each key the grid spans that key's own [min, max] observed bucket —
  * gaps INSIDE a key's activity are filled; nothing is invented before its
  * first or after its last observation (the alternative, a global span,
  * fabricates rows for keys that did not exist yet). Each grid cell
  * carries the event count (0 for gaps) and the LOCF value: the value of
  * the bucket's LAST observation, ordered by (ts, idCol) so ties resolve
  * deterministically, carried forward across empty buckets.
  *
  * == 100 TB shape ==
  *
  * Two exchanges, both post-aggregation: raw events reduce map-side to
  * (key, bucket) cells (count + argmax-by-(ts,id) value — partial
  * aggregation makes the first shuffle |cells|-sized, not |events|), then
  * the cells of one key gather (second shuffle, |cells| rows) and the
  * grid is expanded IN PLACE with `transform(sequence(lo, hi))` over a
  * bucket→cell map — no grid×cells join, and the LOCF window runs on the
  * same hash partitioning the groupBy just produced, so Catalyst inserts
  * NO third exchange. Per-key state is span/step cells — bounded by the
  * resampling horizon (a user-set constant: a year of hours is 8760),
  * never by event volume; a hot key costs its span, not its traffic.
  */
object Resample {

  /** @param events  input frame
    * @param keyCol  grouping key (the series identity)
    * @param tsCol   event-time timestamp column
    * @param idCol   unique tiebreaker (ordering (tsCol, idCol) is total)
    * @param valueCol value to carry forward
    * @param stepMicros bucket width in microseconds (3600e6 = hourly)
    * @return (key, bucket_ts, n_events, value_locf) — one row per key per
    *         step between that key's first and last observation
    */
  def gapFillLocf(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      stepMicros: Long
  ): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    val bucket = floor(unix_micros(col(tsCol)) / lit(stepMicros)).cast("long")
    // per-bucket reduction: count + the (ts, id)-max observation's value.
    // max(struct(...)) compares lexicographically and (ts, id) is total,
    // so the chosen row — and its raw double value — is deterministic on
    // any partitioning or retry.
    val cells = events
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        max(struct(col(tsCol), col(idCol), col(valueCol).as("v")))
          .getField("v").as("last_v"))
    // one row per key: cell list + span; the grid expands AND the LOCF
    // carry rides a single generator walk over the sorted cells
    // ([[graft.expressions.GapFillLocfGen]], r16) — the previous
    // map-expand probed a Catalyst map (LINEAR scan per lookup: O(span ·
    // cells) per key) and then paid a full |grid|-row window sort for the
    // carry; both are gone, the plan is two aggregation exchanges + one
    // Generate. Rows identical (ResampleSpec + the ts01 oracle pin them).
    val perKey = cells
      .groupBy(col(keyCol))
      .agg(
        collect_list(struct(
          col("bucket"), col("n_events"), col("last_v"))).as("cs"),
        min(col("bucket")).as("lo"),
        max(col("bucket")).as("hi"))
    perKey
      .select(col(keyCol), graft.expressions.GapFillLocfGen(
        col("cs"), col("lo"), col("hi")))
      .select(
        col(keyCol),
        timestamp_micros(col("bucket") * lit(stepMicros)).as("bucket_ts"),
        col("n_events"),
        col("value_locf"))
  }
}
