package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE pass — the
  * ingest-gate complement of [[Profiler]] (which DESCRIBES a table, this
  * JUDGES it against a contract). Reference tie-in: the reference's
  * per-item error channel (soft errors, usage.rst:106-111) validates
  * records one at a time inside the pipeline; an expectation suite is
  * the corpus-level form — declared once, checked before data is
  * admitted downstream.
  *
  * Every expectation compiles to a violation-counting aggregate column,
  * so a suite of any size costs ONE map-side-combined scan (plus the
  * count-distinct branch when [[Unique]] is present — the same
  * exact-payload price x18 documents). Results are exact integer counts:
  * the verdict replays bit-for-bit on any engine and any partitioning.
  *
  * At 100 TB this runs as the admission step of the ingest job — one
  * extra aggregate over data already being scanned; gate on
  * `passed = false` rows to quarantine a batch before it pollutes the
  * curated layout (compose with [[Merge]]: validate the batch, then
  * upsert).
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    /** 1 when the row violates the expectation, else 0. */
    private[operators] def violation: Column
  }

  /** Column must be non-null. */
  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null($column)"
    private[operators] def violation: Column =
      when(col(column).isNull, 1L).otherwise(0L)
  }

  /** Column must lie in [lo, hi] (nulls violate — compose with NotNull
    * semantics deliberately: an absent value cannot satisfy a range). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Expectation {
    val name = s"in_range($column,$lo,$hi)"
    private[operators] def violation: Column =
      when(col(column).isNull
        || col(column) < lit(lo) || col(column) > lit(hi), 1L).otherwise(0L)
  }

  /** String column must fully match the anchored regex (nulls violate). */
  final case class MatchesRegex(column: String, regex: String) extends Expectation {
    val name = s"matches_regex($column)"
    private[operators] def violation: Column =
      when(col(column).isNull
        || !regexp_like(col(column), lit(regex)), 1L).otherwise(0L)
  }

  /** Column value must be one of the allowed set (nulls violate). */
  final case class OneOf(column: String, values: Seq[String]) extends Expectation {
    val name = s"one_of($column)"
    private[operators] def violation: Column =
      when(col(column).isNull
        || !col(column).isin(values: _*), 1L).otherwise(0L)
  }

  /** CONDITIONAL contract — "rows where `whenExpr` holds must satisfy
    * `thenExpr`" (if event_type = 'purchase' then amount > 0; if
    * lang = 'en' then quality >= threshold): the cross-field rule the
    * unconditional expectations can't express. Violation = whenExpr true
    * AND thenExpr not true; a row where `whenExpr` is false or NULL is
    * out of the rule's scope and passes, and a NULL `thenExpr` under a
    * true `whenExpr` violates (an unknown consequence cannot discharge
    * an obligation — mirrors [[InRange]]'s nulls-violate stance).
    * Expressions are SQL strings compiled scan-local, so the rule joins
    * the one-pass suite like every other row-local expectation. */
  final case class Implies(whenSql: String, thenSql: String) extends Expectation {
    val name = s"implies($whenSql -> $thenSql)"
    private[operators] def violation: Column =
      when(expr(whenSql) && !coalesce(expr(thenSql), lit(false)), 1L)
        .otherwise(0L)
  }

  /** Column must have no duplicate non-null values. Violations = rows
    * beyond the first per duplicated value (n − distinct), the count a
    * dedup pass would remove. This is the one expectation that is not
    * scan-local: it adds an exact count-distinct branch to the pass. */
  final case class Unique(column: String) extends Expectation {
    val name = s"unique($column)"
    private[operators] def violation: Column = lit(0L) // handled in aggregate
  }

  /** Referential-integrity contract: every NON-NULL value of `column`
    * must exist in `dim`'s `dimColumn`. SQL FK semantics deliberately —
    * a NULL fk does not violate (compose [[NotNull]] when absence is
    * itself illegal). Not part of the scan-local suite because it needs
    * a second input; [[checkWithRelations]] folds its verdicts into the
    * same report schema so one gate covers both.
    *
    * Scale shape per relation: the dim side reduces to its DISTINCT keys
    * (map-side-combined — a key column, never the dim's payload), the
    * orphan probe is a LEFT ANTI join on that key (AQE broadcasts it
    * when the key set fits, shuffles on the key otherwise), and the
    * result collapses to one count row. The fact side is column-pruned
    * to the fk alone, so a 100 TB fact costs one fk-column scan per
    * relation — batch several relations against the same fact in one
    * suite and the scans share the cached columnar batches. */
  final case class ForeignKey(column: String, dimLabel: String,
      dim: DataFrame, dimColumn: String) {
    val name = s"foreign_key($column->$dimLabel.$dimColumn)"
  }

  /** Evaluate the suite in one aggregate pass. Output: one row per
    * expectation — (expectation, violations, passed) — plus a final
    * `(_row_count, n, true)` audit row so an unexpectedly empty batch is
    * visible (every expectation vacuously passes on zero rows; the row
    * count is how callers gate on that). */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "expectation suite must be non-empty")
    val scanAggs = expectations.map {
      case u: Unique =>
        (count(col(u.column)) - countDistinct(col(u.column))).as(u.name)
      case e => sum(e.violation).as(e.name)
    } :+ count(lit(1)).as("_row_count")
    val one = df.agg(scanAggs.head, scanAggs.tail: _*)
    // unpivot the 1-row aggregate into (expectation, violations) rows via
    // an exploded literal struct array (the Profiler trick — arbitrary
    // suite size, one schema)
    val entries = expectations.map(e =>
      struct(lit(e.name).as("expectation"),
        coalesce(col(s"`${e.name}`"), lit(0L)).as("violations"))) :+
      struct(lit("_row_count").as("expectation"),
        col("_row_count").as("violations"))
    one.select(explode(array(entries: _*)).as("e"))
      .select(col("e.expectation").as("expectation"),
        col("e.violations").as("violations"),
        (col("e.expectation") === "_row_count"
          || col("e.violations") === 0L).as("passed"))
  }

  /** [[check]] plus referential-integrity relations, one report: the
    * scan-local suite costs its single aggregate pass, each
    * [[ForeignKey]] adds its anti-join count branch, and everything
    * unions into the same (expectation, violations, passed) schema —
    * the complete admission contract (shape + content + references) as
    * one gateable DataFrame. */
  def checkWithRelations(
      df: DataFrame,
      expectations: Seq[Expectation],
      relations: Seq[ForeignKey]
  ): DataFrame = {
    require(expectations.nonEmpty,
      "checkWithRelations needs a scan suite (use check() alone otherwise)")
    val clash = (df.columns ++ relations.flatMap(_.dim.columns))
      .filter(_ == "__graft_fk")
    require(clash.isEmpty,
      "a column named __graft_fk collides with the relation probe's " +
        "internal join-key namespace")
    val base = check(df, expectations)
    relations.foldLeft(base) { (acc, fk) =>
      // the join key gets an internal name so fact and dim key columns
      // can never collide with each other or with payload columns
      val orphans = df.select(col(fk.column).as("__graft_fk"))
        .filter(col("__graft_fk").isNotNull)
        .join(fk.dim.select(col(fk.dimColumn).as("__graft_fk")).distinct(),
          Seq("__graft_fk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(fk.name).as("expectation"), col("violations"),
          (col("violations") === 0L).as("passed"))
      acc.unionByName(orphans)
    }
  }

  /** True iff every expectation holds (driver-side convenience for gate
    * code paths; the full report is [[check]]). */
  def passes(df: DataFrame, expectations: Seq[Expectation]): Boolean =
    check(df, expectations).filter(!col("passed")).isEmpty

  /** A declared functional dependency `lhs → rhs` to audit. */
  final case class Fd(lhs: Seq[String], rhs: String) {
    require(lhs.nonEmpty && !lhs.contains(rhs), "lhs non-empty, rhs not in lhs")
    val name = s"fd(${lhs.mkString(",")}->$rhs)"
  }

  /** Functional-dependency audit — the profiling companion to
    * [[ForeignKey]]: where FK checks values AGAINST another table, an FD
    * checks internal consistency (`source → lang`, `zip → city`, …), the
    * schema assumptions joins and dedup keys silently rely on. Per
    * declared FD one row: determinant-group counts, how many groups carry
    * more than one dependent value, and the g₃'-style confidence — the
    * row share a minimal repair would KEEP, Σₓ maxᵧ cnt(x,y) / N in
    * integer millionths (Kivinen & Mannila 1995's error measure,
    * complemented; 10⁶ ⇔ the FD holds exactly). NULLs group as values on
    * both sides (two NULL-city rows agree; NULL vs 'Paris' violates) —
    * the grouping semantics both engines share, stated rather than
    * special-cased.
    *
    * Scale shape per FD: one (lhs, rhs) groupBy, re-aggregated by lhs,
    * collapsed to one row — two map-side-combined key-bounded shuffles,
    * nothing proportional to violations; declared FDs are audited
    * independently so a suite is a union of verdict rows, gateable like
    * [[check]]'s report. */
  def fdAudit(df: DataFrame, fds: Seq[Fd]): DataFrame = {
    require(fds.nonEmpty, "declare at least one functional dependency")
    fds.map { fd =>
      val g = df.groupBy((fd.lhs :+ fd.rhs).map(col): _*)
        .agg(count(lit(1)).as("_c"))
      val byLhs = g.groupBy(fd.lhs.map(col): _*)
        .agg(sum(col("_c")).as("_n"), max(col("_c")).as("_keep"),
          count(lit(1)).as("_nd"))
      byLhs.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("violating_groups"),
        sum(col("_n")).as("n_rows"),
        sum(col("_keep")).as("_kept"))
        .select(lit(fd.name).as("fd"), col("n_groups"),
          coalesce(col("violating_groups"), lit(0L)).as("violating_groups"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          when(col("n_rows").isNull, lit(null).cast("long"))
            .otherwise(Agreement.floorDiv(lit(1000000L) * col("_kept"),
              col("n_rows"))).as("confidence_millionths"))
    }.reduce(_ unionByName _)
  }
}
