package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Disclosure-control primitives for PUBLISHING aggregates — the privacy
  * complement of [[Expectations]] (which gates what comes IN, this gates
  * what goes OUT). Reference tie-in: the reference pipelines end in a
  * sink that ships data to an external store (docs/usage.rst:285-295);
  * when the shipped rows are grouped statistics about people, small
  * groups re-identify their members, and the standard statistical-
  * disclosure-control remedy is small-cell suppression before release.
  */
object Privacy {

  /** k-anonymity small-cell suppression over an ALREADY-AGGREGATED
    * frame: every cell whose `countCol` is below `k` has all of its
    * `keyCols` replaced by `otherLabel` and is folded into one residual
    * row, so no published row describes fewer than `k` individuals while
    * corpus TOTALS are preserved exactly (nothing is dropped, only
    * coarsened). The residual row itself may hold fewer than `k` rows in
    * degenerate inputs — it is already non-identifying because every
    * identifying key is masked; callers who must also hide its existence
    * can filter it out (that trades total-preservation for stricter
    * suppression, a policy choice, not an engine one).
    *
    * Keys are cast to string (the label must be representable); measure
    * columns — every non-key column — are summed in their own type, so
    * keep them integral/decimal upstream: a DOUBLE measure would re-add
    * in partition order and lose the bit-exact replay guarantee every
    * published artifact in this engine carries.
    *
    * Scale shape: the input is an aggregate (cells, not rows — bounded
    * by key cardinality, not corpus size), masking is scan-local, and
    * the fold is a re-aggregation OF THE AGGREGATE: at 100 TB the
    * expensive pass is the upstream groupBy the caller already paid;
    * this adds one exchange over the cell table, which is KBs-to-MBs
    * whatever the corpus weighs. NULL keys mask like any other value
    * (they land in `otherLabel` when their cell is small — a NULL key
    * cell is still a cell someone could be singled out by).
    */
  def suppressSmallCells(
      aggregated: DataFrame,
      keyCols: Seq[String],
      countCol: String,
      k: Long,
      otherLabel: String = "__suppressed__"
  ): DataFrame = {
    require(keyCols.nonEmpty, "suppressSmallCells needs at least one key column")
    require(k >= 1, s"k must be positive, got $k")
    val missing = (keyCols :+ countCol).filterNot(aggregated.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    val measures = aggregated.columns.filterNot(keyCols.contains).toSeq
    val small = col(countCol) < lit(k)
    val masked = keyCols.foldLeft(aggregated) { (d, c) =>
      d.withColumn(c,
        when(small, lit(otherLabel)).otherwise(col(c).cast("string")))
    }
    masked.groupBy(keyCols.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Deterministic keyed pseudonymization — the row-level privacy
    * primitive beside [[suppressSmallCells]]'s aggregate one, and the
    * structured-identifier complement of the d14 free-text PII scrub:
    * each listed column's value is replaced by `md5(secret || '|' ||
    * value)`, so direct identifiers leave the table while JOINS STILL
    * WORK — the same (secret, value) maps to the same token in every
    * table, every batch, every engine, so referential integrity and
    * group-by cardinalities survive tokenization exactly (the property
    * the pv01 oracle asserts end-to-end through a tokenized join).
    *
    * 128-bit tokens on purpose: a 10⁹-space hash (PolyHash's modulus)
    * birthday-collides around 30k identities, silently MERGING people —
    * the one failure mode a pseudonymization layer must not have. NULLs
    * stay NULL (absence is not an identity). Scan-local, zero shuffles,
    * codegen'd md5.
    *
    * This is pseudonymization, not anonymization: the mapping is
    * recomputable by anyone holding the secret, and tokens are stable
    * ACROSS releases by design (that stability is what keeps
    * longitudinal joins alive). Rotate the secret per release when
    * unlinkability between releases matters more. */
  def pseudonymize(
      df: DataFrame, cols: Seq[String], secret: String): DataFrame = {
    require(cols.nonEmpty, "name the identifier columns to tokenize")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    cols.foldLeft(df)((acc, c) =>
      acc.withColumn(c,
        md5(concat(lit(secret), lit("|"), col(c).cast("string")))))
  }

  /** l-diversity enforcement (Machanavajjhala et al. 2007) — the gap
    * k-anonymity leaves open: a group can hold ≥ k people and STILL leak
    * if they all share one sensitive value (locate your neighbor in a
    * 50-person cell where every row says the same diagnosis and you've
    * learned it). A published group must carry at least `l` DISTINCT
    * sensitive values; homogeneous groups fold into one masked residual.
    *
    * Published columns: the (stringified) quasi-identifiers, `n_rows`,
    * and `n_distinct_sensitive` — the residual's distinct count is
    * computed over the UNION of the suppressed groups' sensitive values
    * (distinct counts don't sum; recomputing from cells is exact).
    *
    * Scale shape: ONE corpus-scale aggregate — groupBy(QI, sensitive) —
    * then everything (per-group diversity, verdicts, the residual's own
    * distinct count) derives from that CELL table, which is bounded by
    * |QI space| × |sensitive domain|, not corpus size. The same
    * discipline as [[suppressSmallCells]]: the microdata is scanned
    * once, privacy math runs on KBs of cells. */
  def lDiversityPublish(
      rows: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      l: Long,
      otherLabel: String = "__suppressed__"
  ): DataFrame = {
    require(qiCols.nonEmpty, "name the quasi-identifier columns")
    require(l >= 2, s"l must be >= 2 to mean anything, got $l")
    val missing = (qiCols :+ sensitiveCol).filterNot(rows.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    val cells = rows
      .groupBy((qiCols.map(c => col(c).cast("string").as(c)) :+
        col(sensitiveCol).cast("string").as("__sv")): _*)
      .agg(count(lit(1)).as("__n"))
    val diverse = cells
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") >= l)
    // the residual recounts distinct sensitive values over the union of
    // all suppressed groups' cells — a second agg OF THE CELL TABLE, so
    // the published number is exact, not a sum of per-group distincts
    val suppressed = cells
      .join(diverse.select(qiCols.map(col): _*),
        qiCols, "left_anti")
      .agg(sum(col("__n")).as("n_rows"),
        countDistinct(col("__sv")).as("n_distinct_sensitive"))
      .filter(col("n_rows").isNotNull)
      .select(qiCols.map(_ => lit(otherLabel)) ++
        Seq(col("n_rows"), col("n_distinct_sensitive")): _*)
      .toDF(qiCols ++ Seq("n_rows", "n_distinct_sensitive"): _*)
    diverse.unionByName(suppressed)
  }

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the disclosure ladder this object climbs: k-anonymity
    * bounds group SIZE, l-diversity bounds distinct sensitive VALUES,
    * and both still leak when a group's sensitive DISTRIBUTION skews
    * far from the table's (a ≥k, ≥l group that is 95% one diagnosis
    * discloses plenty). t-closeness demands every QI group's sensitive
    * distribution stay within distance t of the global one.
    *
    * For a categorical sensitive attribute under the uniform ground
    * distance, the paper's Earth-Mover's Distance reduces to total
    * variation distance — computed with x26's exact integer arithmetic:
    * per-value |o·Ng − g·No| in longs (exact to ~3e9-row slices, the
    * stated x26 contract; lift to DECIMAL past that), normalized
    * floor(1e6·S / (2·No·Ng)) in DECIMAL(38,0) integral division. The
    * verdict replays bit-for-bit.
    *
    * Returns one AUDIT row per QI group: (qiCols…, n_rows,
    * tvd_millionths, publish = tvd ≤ t). Small groups sit far from the
    * global distribution by sampling alone, so tight budgets flag them
    * wholesale — that is t-closeness behaving as designed (a small
    * group cannot DEMONSTRATE closeness), not an artifact; coarsen the
    * QI or merge cells upstream (dq03's machinery) when that bites.
    *
    * Shape: one corpus-scale groupBy builds the (QI, value) cell table;
    * everything after — global histogram, |groups|×|domain| grid, the
    * TVD aggregate — is cell-table-scale. */
  def tClosenessAudit(
      rows: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      tMillionths: Long
  ): DataFrame = {
    require(qiCols.nonEmpty, "name the quasi-identifier columns")
    require(tMillionths > 0 && tMillionths < 1000000L,
      s"t must be in (0, 1e6) millionths, got $tMillionths")
    val missing = (qiCols :+ sensitiveCol).filterNot(rows.columns.contains)
    require(missing.isEmpty, s"columns not in input: ${missing.mkString(", ")}")
    val cells = rows
      .groupBy((qiCols.map(c => col(c).cast("string").as(c)) :+
        col(sensitiveCol).cast("string").as("__sv")): _*)
      .agg(count(lit(1)).as("__n"))
    val g = cells.groupBy("__sv").agg(sum(col("__n")).as("__gn"))
    val ngDf = g.agg(sum(col("__gn")).as("__ng"))
    val grp = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"))
    // every group × every GLOBAL sensitive value: values a group lacks
    // contribute their full global mass — the same full-domain grid as
    // the categorical drift gate
    val grid = grp.crossJoin(broadcast(g))
    val ap = grid.join(cells, qiCols :+ "__sv", "left")
      .withColumn("__o", coalesce(col("__n"), lit(0L)))
    ap.crossJoin(broadcast(ngDf))
      .groupBy((qiCols.map(col) :+ col("n_rows") :+ col("__ng")): _*)
      .agg(sum(abs(col("__o") * col("__ng") - col("__gn") * col("n_rows")))
        .as("__s"))
      .select(qiCols.map(col) ++ Seq(col("n_rows"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * __s)
          DIV (2 * CAST(n_rows AS DECIMAL(38,0)) * __ng) AS BIGINT)""")
          .as("tvd_millionths")): _*)
      .withColumn("publish", col("tvd_millionths") <= tMillionths)
  }
}
