package graft.queries

import graft.{Dec, GQ, Tables}
import graft.Dec._
import graft.functions.TextFunctions._
import graft.operators.{AsOfJoin, IntervalJoin, Merge, Scd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave operator surface: as-of joins, range joins, grouping sets,
  * analytic window suite, range frames, pivot, generator/explode, SQL-string
  * surface (correlated subqueries), approx sketches, nested structs. */
object Advanced {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Shared by r03/r05: 30-min-gap activity sessions whose active window
    * extends through the timeout ([first_ts, last_ts + 30 min), µs), and
    * ±10-min incident windows around the same user's errors. Both sides
    * persisted: auto width mode's mean-length fit and the join itself each
    * consume them, and Verify/Bench clear the session cache between
    * queries (the pair-finder cache contract). One definition keeps the
    * r03/r05 oracles honest against the SAME session semantics. */
  private def sessionsAndErrors(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = ev.filter(col("event_type") =!= "error")
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(unix_micros(col("ts"))).as("ss"),
        (max(unix_micros(col("ts"))) + 1800L * 1000000L).as("se"))
      .persist()
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"),
        (unix_micros(col("ts")) - 600L * 1000000L).as("es"),
        (unix_micros(col("ts")) + 600L * 1000000L).as("ee"))
      .persist()
    (sessions, errors)
  }

  /** Session-scoped memo for the hive-partitioned layouts pp01/pp02 read —
    * same contract as VectorQueries' fit/index memo: the layout is a
    * DERIVED artifact (a partitioned copy of a testdata table in a temp
    * dir), written once per (dir, JVM); every query run reads it fresh
    * from disk, so the partition-pruning behavior under test is the real
    * parquet-scan path, not a cache effect. At 100 TB this write IS the
    * ingest job's layout decision — you pay it once at write time and
    * every downstream date/key query stops scanning the other partitions. */
  private val layoutMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** A ZERO-ROW input degrades to a plain (unpartitioned) write: an empty
    * partitioned layout has no `col=value` directories at all, so the
    * read-back cannot even infer a schema — the plain parquet file keeps
    * the schema self-describing and the queries return their correct
    * empty answers (there is nothing to prune on nothing). */
  private def writeLayout(df: DataFrame, p: String, parts: Seq[String]): Unit =
    if (df.isEmpty) df.write.mode("overwrite").parquet(p)
    else graft.sources.Sinks.parquetPartitioned(df, p, parts)
  private def ordersByYear(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"orders_by_year:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-pp-orders").toString
      writeLayout(
        t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate"))),
        p, Seq("o_year"))
      p
    })
  private def customerByNation(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"customer_by_nation:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-pp-customer").toString
      writeLayout(t(s, dir, "customer"), p, Seq("c_nationkey"))
      p
    })

  /** u01's MERGED layout: orders partitioned by o_year, then a
    * deterministic change batch (1996 updates + inserts) committed through
    * [[Merge.upsert]] — memoized so every query run reads the POST-merge
    * table from disk: the artifact under test is the committed layout
    * after the copy-on-write rewrite, not an in-memory frame. A zero-row
    * input degrades to a plain write and an empty batch (Merge no-ops). */
  private def mergedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"merge_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-mrg-orders").toString + "/t"
      val base = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
      writeLayout(base, p, Seq("o_year"))
      if (!base.isEmpty) {
        val y96 = base.filter(col("o_year") === 1996)
        val updates = y96.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        val inserts = y96.filter(col("o_orderkey") % 97 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
        Merge.upsert(s, p, updates.unionByName(inserts),
          keyCols = Seq("o_orderkey"), partCols = Seq("o_year"))
      }
      p
    })

  /** z05's layout: the MERGE × MANIFEST composition — u01's COW upsert
    * against a table that carries a stats manifest, with the manifest
    * refresh wired INTO the commit (`Merge.upsert(manifestPath = …)`).
    * The freshness failure this closes: a COW commit replaces the
    * touched directories' files wholesale, so a manifest built before
    * the merge holds paths that no longer exist — a pruned read through
    * it would hand Spark dead files (or miss every rewritten row). With
    * the refresh inside the commit, the post-merge pruned read is
    * row-identical to the declarative MERGE result, which is exactly
    * what the oracle replays. */
  private def mergedManifestOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"mergeman_orders:$dir", _ => {
      val root = java.nio.file.Files.createTempDirectory("graft-mm-orders").toString
      val p = s"$root/t"
      val base = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
      writeLayout(base, p, Seq("o_year"))
      graft.operators.FileManifest.build(s, p, Seq("o_custkey"), s"$root/m")
      if (!base.isEmpty) {
        val y96 = base.filter(col("o_year") === 1996)
        val updates = y96.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        val inserts = y96.filter(col("o_orderkey") % 97 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
        Merge.upsert(s, p, updates.unionByName(inserts),
          keyCols = Seq("o_orderkey"), partCols = Seq("o_year"),
          manifestPath = Some(s"$root/m"))
      }
      root
    })

  /** cdc01's VERSION PAIR: the 1996 orders slice published as v1, then
    * v2 with every 7th price bumped, every 13th row deleted, and a new
    * +1e9-keyed row inserted for every 17th — all four CDC row classes
    * (insert / delete / update_pre / update_post) non-vacuous. */
  private def cdcOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"cdc_orders:$dir", _ => {
      val root = java.nio.file.Files.createTempDirectory("graft-cdc-orders").toString + "/t"
      val y96 = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_totalprice")
      graft.operators.Snapshot.publish(y96, root)
      val bumped = y96.withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
      val v2 = bumped.filter(col("o_orderkey") % 13 =!= 0)
        .unionByName(y96.filter(col("o_orderkey") % 17 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L))
      graft.operators.Snapshot.publish(v2, root)
      root
    })

  /** pp04's PARTITION-SPEC EVOLUTION layout: generation 1 (≤1995) is
    * partitioned by o_year alone; generation 2 (≥1996) adopted the finer
    * (o_year, o_month) spec. Old directories are NEVER rewritten when
    * the spec changes — the only affordable evolution at 100 TB (a
    * repartitioning rewrite of history is a full-table copy); the reader
    * composes the generations with per-generation predicate translation
    * (pp04's query body). */
  private def partEvolvedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"pevolve_orders:$dir", _ => {
      val root = java.nio.file.Files.createTempDirectory("graft-pe-orders").toString
      val base = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
      writeLayout(base.filter(col("o_year") <= 1995), s"$root/g1", Seq("o_year"))
      writeLayout(
        base.filter(col("o_year") >= 1996)
          .withColumn("o_month", month(col("o_orderdate"))),
        s"$root/g2", Seq("o_year", "o_month"))
      root
    })

  /** mv02's JOIN VIEW: revenue by customer nation = orders ⋈ customer,
    * maintained by the delta-join rule Δ(F ⋈ D) = ΔF ⋈ D
    * (`operators/Ivm`): backfill aggregates history-before-cutoff through
    * the join ONCE; the delta batch joins the broadcast dimension alone
    * and merges additively — history is never rescanned. Stored revenue
    * stays DECIMAL so additive merges are exact in any order. */
  private def joinViewOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"ivm_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ivm-orders").toString + "/v"
      def view(df: DataFrame): DataFrame = df
        .join(broadcast(t(s, dir, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(Dec.dec(col("o_totalprice"))).cast(Dec.D2).as("revenue"))
      val base = t(s, dir, "orders")
      val cutoff = lit("1997-06-15").cast("date")
      view(base.filter(col("o_orderdate") < cutoff))
        .coalesce(1).write.mode("overwrite").parquet(p)
      val delta = base.filter(col("o_orderdate") >= cutoff)
      if (!delta.isEmpty)
        graft.operators.Ivm.maintainAdditive(s, p, view(delta),
          keys = Seq("c_nationkey"), addCols = Seq("n_orders", "revenue"))
      p
    })

  /** u04's MERGE-ON-READ layout: orders partitioned by o_year plus an
    * UNFOLDED equality-delete sidecar (every 11th 1995 order) — the query
    * exercises the read path that subtracts the sidecar without any data
    * rewrite having happened. The fold path (sidecar → COW → cleared,
    * incl. manifest composition) is MergeOnReadSpec's territory. */
  private def morOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"mor_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-mor-orders").toString + "/t"
      val base = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
      writeLayout(base, p, Seq("o_year"))
      if (!base.isEmpty) {
        val keys = base
          .filter(col("o_year") === 1995 && col("o_orderkey") % 11 === 0)
          .select("o_orderkey", "o_year")
        graft.operators.MergeOnRead.appendDeletes(s, p, keys,
          keyCols = Seq("o_orderkey"), partCols = Seq("o_year"))
      }
      p
    })

  /** u03's VERSIONED root: two immutable published snapshots of the 1996
    * orders slice — v1 the original, v2 after the u01-style price bump on
    * every 7th key. Time travel = reading a pinned `v=K` directory; the
    * root itself is hive-readable, so the cross-version audit is ONE scan
    * with `v` as a partition column. */
  private def versionedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"ver_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ver-orders").toString + "/t"
      val y96 = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_totalprice")
      graft.operators.Snapshot.publish(y96, p)
      graft.operators.Snapshot.publish(
        y96.withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice"))), p)
      p
    })

  /** z02's stats-manifest root: orders z-ordered on (o_custkey,
    * o_orderkey) into 16 files (tight per-file ranges — the write-side
    * half), plus the stored per-file min/max manifest over both columns
    * (`FileManifest.build` — the read-side half). */
  private def manifestOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"manifest_orders:$dir", _ => {
      val root = java.nio.file.Files.createTempDirectory("graft-fm-orders").toString
      graft.operators.Layout.zorderWrite(
        t(s, dir, "orders"), Seq("o_custkey", "o_orderkey"), s"$root/t", nFiles = 16)
      graft.operators.FileManifest.build(
        s, s"$root/t", Seq("o_custkey", "o_orderkey"), s"$root/m")
      // bloom manifest for z04: o_orderkey is unique-per-row and the
      // z-interleave scatters its range across every file, so range stats
      // cannot prune a point lookup — membership can
      graft.operators.FileManifest.buildWithBloom(
        s, s"$root/t", Seq("o_custkey"), Seq("o_orderkey"), s"$root/mb",
        expectedPerFile = 50000L)
      root
    })

  /** c02's COMPACTED layout: orders partitioned by o_year, deliberately
    * fragmented (12-way repartition before the write → up to 12 small
    * files per year directory — the shape a per-micro-batch ingest
    * leaves), then bin-packed by [[graft.operators.Compaction.compact]]
    * to one file per directory. Memoized so every run reads the
    * POST-compaction layout from disk. */
  private def compactedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"compact_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-cmp-orders").toString + "/t"
      writeLayout(
        t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
          .repartition(12),
        p, Seq("o_year"))
      graft.operators.Compaction.compact(
        s, p, Seq("o_year"), targetBytes = 1L << 30)
      p
    })

  /** c03's layout: fragmented like c02's, but compacted in OPTIMIZE-ZORDER
    * mode — bin packing AND (o_custkey, o_orderkey) Morton clustering
    * restored in the same single rewrite of the fragmented directories. */
  private def zCompactedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"zcompact_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-zc-orders").toString + "/t"
      writeLayout(
        t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
          .repartition(12),
        p, Seq("o_year"))
      graft.operators.Compaction.compact(
        s, p, Seq("o_year"), targetBytes = 1L << 30,
        zorderBy = Seq("o_custkey", "o_orderkey"))
      p
    })

  /** sv01's EVOLVED layout: two ingest generations in one partitioned
    * table — 1995 written with the original schema, 1996 appended later
    * with an extra `o_channel` column. Old files are NEVER rewritten
    * (additive schema evolution, the only kind that is O(0) at 100 TB);
    * the reader reconciles via parquet schema merging, old rows surface
    * NULL for the new column. */
  private def evolvedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"evolve_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-ev-orders").toString + "/t"
      val base = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
      val g1 = base.filter(col("o_year") === 1995)
      val g2 = base.filter(col("o_year") === 1996)
        .withColumn("o_channel",
          when(col("o_orderkey") % 3 === 0, lit("web")).otherwise(lit("store")))
      if (g2.isEmpty)
        // no evolved generation (incl. the zero-row degenerate): keep the
        // schema total by carrying the new column as NULLs so readers
        // never face a column that exists in no file at all
        writeLayout(g1.withColumn("o_channel", lit(null).cast("string")),
          p, Seq("o_year"))
      else {
        g1.write.mode("overwrite").partitionBy("o_year").parquet(p)
        g2.write.mode("append").partitionBy("o_year").parquet(p)
      }
      p
    })

  /** mv01's MAINTAINED rollup: a stored monthly revenue aggregate kept
    * current by INCREMENTAL refresh — the materialized-view pattern. The
    * backfill aggregates history up to a mid-month cutoff; when the delta
    * (orders ≥ cutoff) arrives, only the months the delta TOUCHES are
    * recomputed (from full month data — one month's scan, not history's)
    * and upserted into the rollup via [[Merge.upsert]] keyed on
    * (o_year, o_month). The stale partial June-1997 row is REPLACED, not
    * double-counted — the correctness trap incremental aggregation must
    * dodge. mv01's oracle recomputes the whole rollup from scratch:
    * incremental maintenance must be indistinguishable from recompute. */
  private def rollupOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"rollup_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-mv-orders").toString + "/t"
      val base = t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .withColumn("o_month", month(col("o_orderdate")))
      def roll(df: DataFrame): DataFrame = df
        .groupBy("o_year", "o_month")
        .agg(count(lit(1)).as("n_orders"),
          Dec.dsum(col("o_totalprice")).as("revenue"))
      val cutoff = lit("1997-06-15").cast("date")
      writeLayout(roll(base.filter(col("o_orderdate") < cutoff)), p, Seq("o_year"))
      val delta = base.filter(col("o_orderdate") >= cutoff)
      if (!delta.isEmpty) {
        val touched = delta.select("o_year", "o_month").distinct()
        val refreshed = roll(base.join(touched, Seq("o_year", "o_month")))
        Merge.upsert(s, p, refreshed,
          keyCols = Seq("o_year", "o_month"), partCols = Seq("o_year"))
      }
      p
    })

  /** u02's PURGED layout: the delete-side twin of [[mergedOrders]] — every
    * fifth 1997 order purged by key through [[Merge.delete]] (the
    * right-to-be-forgotten shape: keys ship WITH their partition values,
    * so only the named directories are read or rewritten). */
  private def purgedOrders(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"purge_orders:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-del-orders").toString + "/t"
      val base = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
      writeLayout(base, p, Seq("o_year"))
      if (!base.isEmpty) {
        val keys = base
          .filter(col("o_year") === 1997 && col("o_orderkey") % 5 === 0)
          .select("o_orderkey", "o_year")
        Merge.delete(s, p, keys,
          keyCols = Seq("o_orderkey"), partCols = Seq("o_year"))
      }
      p
    })

  /** u05/fs01's SCD2 customer dimension (`operators/Scd`): initial load at
    * v1, then two deterministic change batches —
    *
    *   v2: every 3rd customer's balance +100, plus CLONE inserts
    *       (c_custkey + 10M) for every 97th customer;
    *   v3: every 6th CURRENT key's balance +50 (built from the table's own
    *       current slice, so it compounds on v2's bump — the realistic
    *       feed shape where batches derive from live state).
    *
    * Memoized like [[mergedOrders]]: the artifact under test is the
    * committed partitioned history on disk (open slice in `scd_part=cur`,
    * versions closed at v in append-only `scd_part=v`), read fresh by the
    * queries. */
  private def scdCustomers(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"scd_customers:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-scd-cust").toString + "/t"
      val c = t(s, dir, "customer")
      Scd.init(s, p, c, version = 1L)
      if (!c.isEmpty) {
        val b2 = c.filter(col("c_custkey") % 3 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0)
          .unionByName(c.filter(col("c_custkey") % 97 === 0)
            .withColumn("c_custkey", col("c_custkey") + 10000000L)
            .withColumn("c_mktsegment", lit("CLONE")))
        Scd.applyChanges(s, p, b2, Seq("c_custkey"), version = 2L)
        val b3 = Scd.current(s, p)
          .filter(col("c_custkey") % 6 === 0)
          .drop(Scd.FromCol, Scd.ToCol)
          .withColumn("c_acctbal", col("c_acctbal") + 50.0)
        Scd.applyChanges(s, p, b3, Seq("c_custkey"), version = 3L)
      }
      p
    })

  /** fs02's second and third SCD2 dimensions — supplier and part histories
    * with ONE change round each (v2 bumps a deterministic key slice), so
    * the two-dim point-in-time join has version skew to exercise on both
    * axes while the oracle's replay CTEs stay readable. Same stored-table
    * memo contract as [[scdCustomers]]. */
  private def scdSuppliers(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"scd_suppliers:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-scd-supp").toString + "/t"
      val sup = t(s, dir, "supplier")
      Scd.init(s, p, sup, version = 1L)
      if (!sup.isEmpty) {
        val b2 = sup.filter(col("s_suppkey") % 4 === 0)
          .withColumn("s_acctbal", col("s_acctbal") + 100.0)
        Scd.applyChanges(s, p, b2, Seq("s_suppkey"), version = 2L)
      }
      p
    })

  private def scdParts(s: SparkSession, dir: String): String =
    layoutMemo.computeIfAbsent(s"scd_parts:$dir", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-scd-part").toString + "/t"
      val part = t(s, dir, "part")
      Scd.init(s, p, part, version = 1L)
      if (!part.isEmpty) {
        val b2 = part.filter(col("p_partkey") % 5 === 0)
          .withColumn("p_retailprice", col("p_retailprice") + 10.0)
        Scd.applyChanges(s, p, b2, Seq("p_partkey"), version = 2L)
      }
      p
    })

  val queries: Seq[GQ] = Seq(
    GQ("a01_asof_join", // point-in-time: latest order at/before each event
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "event_id", "ts")
        val o = t(s, dir, "orders")
        AsOfJoin.asofJoin(ev, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = "o_orderkey")
          .select("user_id", "event_id", "asof_o_orderkey", "asof_o_totalprice")
      },
      Some("""WITH l AS (SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, event_id,
                CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice,
                1 AS is_l FROM events),
        r AS (SELECT o_custkey AS k, o_orderdate AS t, CAST(NULL AS BIGINT) AS event_id,
                o_orderkey, o_totalprice, 0 AS is_l FROM orders),
        u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        f AS (SELECT k, event_id, is_l,
                LAST_VALUE(o_orderkey IGNORE NULLS) OVER w AS asof_o_orderkey,
                LAST_VALUE(o_totalprice IGNORE NULLS) OVER w AS asof_o_totalprice
              FROM u WINDOW w AS (PARTITION BY k ORDER BY t, is_l, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT k AS user_id, event_id, asof_o_orderkey, asof_o_totalprice
        FROM f WHERE is_l = 1""")),

    GQ("a02_asof_strict", // strict-before: latest order strictly before each event
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "event_id", "ts")
        val o = t(s, dir, "orders")
        AsOfJoin.asofJoin(ev, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = "o_orderkey", inclusive = false)
          .select("user_id", "event_id", "asof_o_orderkey", "asof_o_totalprice")
      },
      // Same replay as a01 with the side order flipped: left (is_l=1) sorts
      // before right at equal t, so same-instant orders are NOT visible.
      Some("""WITH l AS (SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, event_id,
                CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice,
                1 AS is_l FROM events),
        r AS (SELECT o_custkey AS k, o_orderdate AS t, CAST(NULL AS BIGINT) AS event_id,
                o_orderkey, o_totalprice, 0 AS is_l FROM orders),
        u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        f AS (SELECT k, event_id, is_l,
                LAST_VALUE(o_orderkey IGNORE NULLS) OVER w AS asof_o_orderkey,
                LAST_VALUE(o_totalprice IGNORE NULLS) OVER w AS asof_o_totalprice
              FROM u WINDOW w AS (PARTITION BY k ORDER BY t, 1 - is_l, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT k AS user_id, event_id, asof_o_orderkey, asof_o_totalprice
        FROM f WHERE is_l = 1""")),

    GQ("a03_asof_bucketed", // hot-key escape hatch: identical result to a01
      // via (key, quarter-bucket) windows + cross-bucket carry — the oracle
      // is a01's verbatim, proving the salted plan IS the unsalted semantics
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "event_id", "ts")
        val o = t(s, dir, "orders")
        AsOfJoin.asofJoinBucketed(ev, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = "o_orderkey",
          bucketOf = tc => date_trunc("quarter", tc))
          .select("user_id", "event_id", "asof_o_orderkey", "asof_o_totalprice")
      },
      Some("""WITH l AS (SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS t, event_id,
                CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice,
                1 AS is_l FROM events),
        r AS (SELECT o_custkey AS k, o_orderdate AS t, CAST(NULL AS BIGINT) AS event_id,
                o_orderkey, o_totalprice, 0 AS is_l FROM orders),
        u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        f AS (SELECT k, event_id, is_l,
                LAST_VALUE(o_orderkey IGNORE NULLS) OVER w AS asof_o_orderkey,
                LAST_VALUE(o_totalprice IGNORE NULLS) OVER w AS asof_o_totalprice
              FROM u WINDOW w AS (PARTITION BY k ORDER BY t, is_l, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT k AS user_id, event_id, asof_o_orderkey, asof_o_totalprice
        FROM f WHERE is_l = 1""")),

    GQ("r01_range_join", // interval lookup via broadcast
      (s, dir) => {
        import s.implicits._
        val bands = Seq((0.0, 10.0, "small"), (10.0, 25.0, "mid"), (25.0, 51.0, "big"))
          .toDF("lo", "hi", "band")
        AsOfJoin.rangeJoin(t(s, dir, "lineitem"), bands, "l_quantity")
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total_price"))
      },
      Some("""SELECT band, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM lineitem
        JOIN (VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'mid'), (25.0, 51.0, 'big'))
          AS b(lo, hi, band)
        ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band""")),

    GQ("r02_range_join_custom", // custom BroadcastRangeJoinExec SparkPlan
      (s, dir) => {
        import s.implicits._
        val bands = Seq((0.0, 10.0, "small"), (10.0, 25.0, "mid"), (25.0, 51.0, "big"))
          .toDF("lo", "hi", "band")
        graft.plans.RangeJoinPlan.exec(
          t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
          bands, "l_quantity", "lo", "hi")
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
      },
      Some("""SELECT band, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        JOIN (VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'mid'), (25.0, 51.0, 'big'))
          AS b(lo, hi, band)
        ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band""")),

    GQ("r03_overlap_join", // interval×interval: sessions × error windows
      // Both sides are intervals (neither broadcast-small at scale), so this
      // is the bucket-decomposed overlap join — per-task work bounded by
      // (key, hour-bucket) density, exactly-once via the claim rule, no
      // BroadcastNestedLoopJoin anywhere (plan-asserted in EntrySpec).
      (s, dir) => {
        val (sessions, errors) = sessionsAndErrors(s, dir)
        // auto mode: bucket width from the sides' mean interval lengths —
        // the width only tunes replication vs density, parity-tested
        // width-independent, so the oracle gates auto mode itself
        IntervalJoin.overlapJoinAuto(sessions, errors, Seq("user_id"),
          "ss", "se", "es", "ee")
          .groupBy("user_id", "session_id")
          .agg(min(col("ss")).as("sess_start_us"),
            count(lit(1)).as("n_error_windows"))
      },
      Some("""WITH ne AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsm
                FROM events WHERE event_type <> 'error'),
        m AS (SELECT user_id, event_id, tsm,
                CASE WHEN LAG(tsm, 1) OVER w IS NULL
                          OR epoch_us(tsm) - epoch_us(LAG(tsm, 1) OVER w) > 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM ne WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        sess AS (SELECT user_id,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsm, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
                   epoch_us(tsm) AS us
                 FROM m),
        iv AS (SELECT user_id, session_id, MIN(us) AS ss,
                 MAX(us) + 1800 * 1000000 AS se
               FROM sess GROUP BY user_id, session_id),
        ew AS (SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) - 600 * 1000000 AS es,
                 epoch_us(CAST(ts AS TIMESTAMP)) + 600 * 1000000 AS ee
               FROM events WHERE event_type = 'error')
        SELECT iv.user_id, session_id, ss AS sess_start_us,
          COUNT(*) AS n_error_windows
        FROM iv JOIN ew ON iv.user_id = ew.user_id
          AND iv.ss < ew.ee AND ew.es < iv.se
        GROUP BY iv.user_id, session_id, ss""")),

    GQ("r04_interval_coverage", // per-key interval UNION (islands): merge
      // overlapping [ts, ts+15min) activity windows per user → how many
      // disjoint active stretches and total covered time. The complement
      // of the overlap join: coverage/gap analysis over the same interval
      // model. One shuffle on user_id; the island merge is the d26
      // running-max gaps-and-islands on longs (tied rows are identical
      // (st, en) pairs — st ties imply en ties — so tie order cannot
      // change any flag). Linear at any scale; a pathologically hot key
      // falls to the same bucketed-window hatch as the as-of family.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("en"))
        val iv = Tables.events(s, dir).select(col("user_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) + 900L * 1000000L).as("en"))
        val pme = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
        iv.withColumn("ni", when(pme.isNull || col("st") > pme, 1L).otherwise(0L))
          .withColumn("island", sum(col("ni")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "island")
          .agg(min(col("st")).as("is_s"), max(col("en")).as("is_e"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("is_e") - col("is_s")).as("covered_us"))
      },
      Some("""WITH iv AS (SELECT user_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS st,
                epoch_us(CAST(ts AS TIMESTAMP)) + 900 * 1000000 AS en
              FROM events),
        m AS (SELECT user_id, st, en,
                MAX(en) OVER (PARTITION BY user_id ORDER BY st, en
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
              FROM iv),
        f AS (SELECT user_id, st, en,
                CASE WHEN pme IS NULL OR st > pme THEN 1 ELSE 0 END AS ni
              FROM m),
        g AS (SELECT user_id, st, en,
                CAST(SUM(ni) OVER (PARTITION BY user_id ORDER BY st, en
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
              FROM f),
        i AS (SELECT user_id, island, MIN(st) AS s, MAX(en) AS e
              FROM g GROUP BY user_id, island)
        SELECT user_id, COUNT(*) AS n_islands,
          CAST(SUM(e - s) AS BIGINT) AS covered_us
        FROM i GROUP BY user_id""")),

    GQ("r05_containing_sessions", // Allen-relation variant of r03: sessions
      // whose active window fully CONTAINS an error's ±10-min incident
      // window (not merely touches it) — same grid plan, same claim rule
      // (the intersection start is the contained side's start), only the
      // join predicate changes. Pinned hour buckets exercise the
      // non-auto path alongside r03's auto mode.
      (s, dir) => {
        val (sessions, errors) = sessionsAndErrors(s, dir)
        IntervalJoin.overlapJoin(sessions, errors, Seq("user_id"),
          "ss", "se", "es", "ee", bucketWidth = 3600L * 1000000L,
          mode = "contains")
          .groupBy("user_id", "session_id")
          .agg(min(col("ss")).as("sess_start_us"),
            count(lit(1)).as("n_contained"))
      },
      Some("""WITH ne AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsm
                FROM events WHERE event_type <> 'error'),
        m AS (SELECT user_id, event_id, tsm,
                CASE WHEN LAG(tsm, 1) OVER w IS NULL
                          OR epoch_us(tsm) - epoch_us(LAG(tsm, 1) OVER w) > 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM ne WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        sess AS (SELECT user_id,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsm, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
                   epoch_us(tsm) AS us
                 FROM m),
        iv AS (SELECT user_id, session_id, MIN(us) AS ss,
                 MAX(us) + 1800 * 1000000 AS se
               FROM sess GROUP BY user_id, session_id),
        ew AS (SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) - 600 * 1000000 AS es,
                 epoch_us(CAST(ts AS TIMESTAMP)) + 600 * 1000000 AS ee
               FROM events WHERE event_type = 'error')
        SELECT iv.user_id, session_id, ss AS sess_start_us,
          COUNT(*) AS n_contained
        FROM iv JOIN ew ON iv.user_id = ew.user_id
          AND iv.ss <= ew.es AND ew.ee <= iv.se
        GROUP BY iv.user_id, session_id, ss""")),

    GQ("r06_interval_gaps", // the complement of r04: the IDLE stretches
      // BETWEEN a user's merged activity islands — each gap row is
      // (island_end, next_island_start). Same one-shuffle island merge as
      // r04 (running-max gaps-and-islands; st ties imply en ties, so tie
      // order cannot flip a flag), then a lead() over the per-user island
      // rows — which number at most the island count, so the second window
      // rides the agg's existing user_id partitioning with no new
      // Exchange. Gap bounds are exact micros; no arithmetic beyond
      // subtraction, so the DuckDB replay is bit-exact. Completes the
      // temporal family: overlap (r03), union/coverage (r04), containment
      // (r05), gaps (r06).
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("en"))
        val iv = Tables.events(s, dir).select(col("user_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) + 900L * 1000000L).as("en"))
        val pme = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
        val islands = iv
          .withColumn("ni", when(pme.isNull || col("st") > pme, 1L).otherwise(0L))
          .withColumn("island", sum(col("ni")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "island")
          .agg(min(col("st")).as("is_s"), max(col("en")).as("is_e"))
        val wi = Window.partitionBy(col("user_id")).orderBy(col("is_s"))
        islands
          .select(col("user_id"), col("is_e").as("gap_s"),
            lead(col("is_s"), 1).over(wi).as("gap_e"))
          .where(col("gap_e").isNotNull)
          .select(col("user_id"), col("gap_s"), col("gap_e"),
            (col("gap_e") - col("gap_s")).as("gap_us"))
      },
      Some("""WITH iv AS (SELECT user_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS st,
                epoch_us(CAST(ts AS TIMESTAMP)) + 900 * 1000000 AS en
              FROM events),
        m AS (SELECT user_id, st, en,
                MAX(en) OVER (PARTITION BY user_id ORDER BY st, en
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
              FROM iv),
        f AS (SELECT user_id, st, en,
                CASE WHEN pme IS NULL OR st > pme THEN 1 ELSE 0 END AS ni
              FROM m),
        g AS (SELECT user_id, st, en,
                CAST(SUM(ni) OVER (PARTITION BY user_id ORDER BY st, en
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
              FROM f),
        i AS (SELECT user_id, island, MIN(st) AS is_s, MAX(en) AS is_e
              FROM g GROUP BY user_id, island),
        l AS (SELECT user_id, is_e AS gap_s,
                LEAD(is_s, 1) OVER (PARTITION BY user_id ORDER BY is_s) AS gap_e
              FROM i)
        SELECT user_id, gap_s, gap_e, gap_e - gap_s AS gap_us
        FROM l WHERE gap_e IS NOT NULL""")),

    GQ("g01_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")),

    GQ("w01_analytic_suite",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        PERCENT_RANK() OVER w AS pr,
        CUME_DIST() OVER w AS cd,
        NTH_VALUE(o_orderkey, 2) OVER w AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    GQ("w02_trailing_30d", // RANGE frame over day offsets
      (s, dir) => {
        val d = t(s, dir, "orders")
          .withColumn("d", datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
          .rangeBetween(-30, 0)
        d.select(col("o_custkey"), col("o_orderkey"), col("d"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("trailing_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_spend
        FROM orders""")),

    GQ("w04_trailing_bucketed", // hot-key escape hatch for RANGE-frame sums:
      // identical rows to w02 via (key, time-bucket) windows + boundary-row
      // context duplication, oracled with w02's plain-window SQL. Rank
      // filters get WindowGroupLimit from the optimizer; range-frame SUMs
      // don't — this is their hatch (operators.TrailingAgg).
      (s, dir) => {
        val d = t(s, dir, "orders")
          .withColumn("d", datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
          .withColumn("v", dec(col("o_totalprice")))
        graft.operators.TrailingAgg.trailingSumBucketed(
          d, "o_custkey", "d", "v", frame = 30, bucketWidth = 90, out = "ts")
          .select(col("o_custkey"), col("o_orderkey"), col("d"),
            col("ts").cast("double").as("trailing_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS d,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
          (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1995-01-01', o_orderdate)
           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_spend
        FROM orders""")),

    GQ("w03_frame_bounds", // first/last_value with explicit ROWS frames
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_key"),
          last(col("o_orderkey")).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)).as("last_key"),
          max(col("o_totalprice")).over(
            w.rowsBetween(-1, 1)).as("local_max"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
        LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_key,
        MAX(o_totalprice) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS local_max
        FROM orders""")),

    GQ("w05_time_weighted_avg", // step-function time integral per user:
      // each event's value holds until the next event or a 1-hour timeout,
      // whichever comes first (tick-data/billing semantics — a plain AVG
      // ignores HOW LONG a value was in effect). One shuffle on user_id
      // (lead + agg share it). Engine-exact by integer arithmetic: value
      // quantized to millis (round-half-away in both engines on identical
      // doubles), durations in whole seconds, integer DIV at the end —
      // no double accumulates across rows, so ordering cannot matter.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("us"))
          .withColumn("dur_s",
            least(coalesce((lead(col("us"), 1).over(w) - col("us")),
              lit(3600L * 1000000L)) , lit(3600L * 1000000L)) / lit(1000000L) cast "long")
          .withColumn("vq", round(col("value") * 1000).cast("long"))
          .groupBy("user_id")
          .agg(sum(col("vq") * col("dur_s")).as("sum_vsec"),
            sum(col("dur_s")).as("active_s"))
          .withColumn("twa_milli",
            expr("CAST(sum_vsec DIV active_s AS BIGINT)"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, value,
                epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        d AS (SELECT user_id, value,
                CAST(LEAST(COALESCE(LEAD(us, 1) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) - us, CAST(3600000000 AS BIGINT)),
                  CAST(3600000000 AS BIGINT)) // 1000000 AS BIGINT) AS dur_s,
                CAST(ROUND(value * 1000) AS BIGINT) AS vq
              FROM e)
        SELECT user_id,
          CAST(SUM(vq * dur_s) AS BIGINT) AS sum_vsec,
          CAST(SUM(dur_s) AS BIGINT) AS active_s,
          CAST(SUM(vq * dur_s) // SUM(dur_s) AS BIGINT) AS twa_milli
        FROM d GROUP BY user_id""")),

    GQ("w06_twa_bucketed", // hot-key escape hatch for the lead() family:
      // identical rows to w05 via (key, 6-hour-bucket) leads + a one-row-
      // per-bucket cross-bucket carry (operators.NextEvent), oracled with
      // w05's plain-window SQL — completing the per-family hatch set
      // (rank → WindowGroupLimit; last_value → asofJoinBucketed;
      // range-frame → trailingSumBucketed; running → runningSumBucketed;
      // lead → nextTimeBucketed).
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("us"))
        graft.operators.NextEvent.nextTimeBucketed(base, "user_id", "us",
          Seq("event_id"), bucketWidth = 6L * 3600L * 1000000L, out = "nxt")
          .withColumn("dur_s",
            least(coalesce(col("nxt") - col("us"), lit(3600L * 1000000L)),
              lit(3600L * 1000000L)) / lit(1000000L) cast "long")
          .withColumn("vq", round(col("value") * 1000).cast("long"))
          .groupBy("user_id")
          .agg(sum(col("vq") * col("dur_s")).as("sum_vsec"),
            sum(col("dur_s")).as("active_s"))
          .withColumn("twa_milli",
            expr("CAST(sum_vsec DIV active_s AS BIGINT)"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, value,
                epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        d AS (SELECT user_id, value,
                CAST(LEAST(COALESCE(LEAD(us, 1) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) - us, CAST(3600000000 AS BIGINT)),
                  CAST(3600000000 AS BIGINT)) // 1000000 AS BIGINT) AS dur_s,
                CAST(ROUND(value * 1000) AS BIGINT) AS vq
              FROM e)
        SELECT user_id,
          CAST(SUM(vq * dur_s) AS BIGINT) AS sum_vsec,
          CAST(SUM(dur_s) AS BIGINT) AS active_s,
          CAST(SUM(vq * dur_s) // SUM(dur_s) AS BIGINT) AS twa_milli
        FROM d GROUP BY user_id""")),

    GQ("q37_hof_suite", // higher-order array functions as first-class surface
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), words(col("text")).as("ws"))
          .select(col("doc_id"),
            exists(col("ws"), w => length(w) > 5).as("has_long_word"),
            forall(col("ws"), w => length(w) >= 2).as("all_words_2plus"),
            aggregate(col("ws"), lit(0),
              (acc, w) => acc + length(w)).as("total_chars"),
            size(filter(col("ws"), w => w.startsWith("s"))).as("s_words")),
      Some("""WITH t AS (SELECT doc_id,
          list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents)
        SELECT doc_id,
          len(list_filter(ws, w -> length(w) > 5)) > 0 AS has_long_word,
          len(list_filter(ws, w -> length(w) < 2)) = 0 AS all_words_2plus,
          CAST(list_sum(list_prepend(0, list_transform(ws, w -> CAST(length(w) AS INTEGER)))) AS INTEGER) AS total_chars,
          CAST(len(list_filter(ws, w -> w LIKE 's%')) AS INTEGER) AS s_words
        FROM t""")),

    GQ("q38_null_handling",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").groupBy("o_custkey")
          .agg(Dec.dsum(col("o_totalprice")).as("spent"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("spent"), lit(0.0)).as("spent_or_zero"),
            col("spent").isNull.as("never_ordered"),
            nullif(col("c_acctbal"), lit(0.0)).as("acctbal_nullable"),
            when(col("spent").isNotNull, col("c_name")).as("name_if_buyer"))
      },
      Some("""WITH o AS (SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
          FROM orders GROUP BY o_custkey)
        SELECT c_custkey,
          COALESCE(spent, 0.0) AS spent_or_zero,
          spent IS NULL AS never_ordered,
          NULLIF(c_acctbal, 0.0) AS acctbal_nullable,
          CASE WHEN spent IS NOT NULL THEN c_name END AS name_if_buyer
        FROM customer LEFT JOIN o ON c_custkey = o_custkey""")),

    GQ("v01_pivot",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(dsum(col("o_totalprice"))),
      Some("""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        FROM orders GROUP BY o_orderpriority""")),

    GQ("v02_unpivot", // wide→long melt, the inverse of v01: the aggregated
      // metric columns unpivot into (metric, value) rows — Spark's native
      // unpivot (Catalyst Expand), replayed in the oracle as the UNION ALL
      // it is semantically equivalent to.
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).cast("double").as("n_orders"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("sum_price"), col("n_orders")), "metric", "value"),
      Some("""WITH w AS (SELECT o_orderpriority,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
            CAST(COUNT(*) AS DOUBLE) AS n_orders
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value FROM w
        UNION ALL
        SELECT o_orderpriority, 'n_orders', n_orders FROM w""")),

    GQ("v03_variant_json", // Spark 4 VARIANT surface — the semi-structured
      // column type an ingest pipeline stores raw JSON payloads in (crawl
      // records, event bodies) so fields are extracted at QUERY time with
      // no up-front schema: parse_json → binary variant, variant_get with
      // a target type per path. Payloads here are synthesized from orders
      // via to_json so the oracle can replay against the typed originals —
      // the round trip is value-lossless (Jackson doubles round-trip,
      // bigint/string exact), which is precisely the property that makes
      // VARIANT safe for typed extraction. variant_get is codegen'd
      // shredded access: at 100 TB only the requested paths are decoded,
      // never the whole document (vs from_json materializing the full
      // struct). One scan, one map-side-combined aggregate.
      (s, dir) => {
        val v = t(s, dir, "orders").select(parse_json(to_json(struct(
          col("o_custkey"), col("o_totalprice"), col("o_orderstatus")))).as("v"))
        v.select(
            expr("variant_get(v, '$.o_orderstatus', 'string')").as("status"),
            expr("variant_get(v, '$.o_custkey', 'bigint')").as("cust"),
            expr("variant_get(v, '$.o_totalprice', 'double')").as("price"))
          .groupBy("status")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("cust")).as("cust_sum"),
            Dec.dsum(col("price")).as("revenue"))
      },
      Some("""SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
          CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1""")),

    GQ("f02_map_funcs", // MapType surface: per-status totals folded into a
      // status→total MAP per customer (keys unique by construction — maps
      // reject duplicates), read back via size + element_at. The oracle
      // replays the map as its underlying key/value pairs.
      (s, dir) => {
        val per = t(s, dir, "orders")
          .groupBy("o_custkey", "o_orderstatus")
          .agg(dsum(col("o_totalprice")).as("tot"))
        per.groupBy("o_custkey")
          .agg(map_from_arrays(
            collect_list(col("o_orderstatus")),
            collect_list(col("tot"))).as("m"))
          .select(col("o_custkey"), size(col("m")).as("map_size"),
            element_at(col("m"), "F").as("f_total"))
      },
      Some("""WITH per AS (SELECT o_custkey, o_orderstatus,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
          FROM orders GROUP BY 1, 2)
        SELECT o_custkey, CAST(COUNT(*) AS INTEGER) AS map_size,
          MAX(CASE WHEN o_orderstatus = 'F' THEN tot END) AS f_total
        FROM per GROUP BY o_custkey""")),

    GQ("x01_word_freq", // generator/UDTF surface: explode → re-aggregate
      (s, dir) =>
        t(s, dir, "documents")
          .select(words(col("text")).as("ws"))
          .select(explode(col("ws")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n")),
      Some("""SELECT w, COUNT(*) AS n FROM (
          SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS w
          FROM documents)
        GROUP BY w""")),

    GQ("x02_percentiles",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
          MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
          FROM orders GROUP BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
        MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        FROM orders GROUP BY o_orderstatus""")),

    GQ("j01_correlated_subquery", // SQL-string surface
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT c_custkey, c_acctbal FROM customer c
          WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                    / COUNT(*)
                             FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer c
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""")),

    GQ("j03_not_in_null_semantics", // SQL NOT IN under tri-valued logic —
      // the classic silent-wrong-results trap: a NULL probe value makes
      // `x NOT IN (set)` UNKNOWN, so the row is dropped, not kept. The
      // probe nulls are synthesized deterministically (NULLIF on one
      // nation key) so both engines face rows where the three-valued
      // outcome differs from the naive anti-join; the subquery set is
      // null-free so the result is non-vacuously populated. Both engines
      // implement ANSI semantics — the oracle confirms the engine didn't
      // compile NOT IN to a plain anti join.
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "supplier").createOrReplaceTempView("supplier")
        s.sql("""SELECT c_custkey, NULLIF(c_nationkey, 5) AS probe_key
          FROM customer
          WHERE NULLIF(c_nationkey, 5) NOT IN
            (SELECT s_nationkey FROM supplier WHERE s_nationkey < 8)""")
      },
      Some("""SELECT c_custkey, NULLIF(c_nationkey, 5) AS probe_key
        FROM customer
        WHERE NULLIF(c_nationkey, 5) NOT IN
          (SELECT s_nationkey FROM supplier WHERE s_nationkey < 8)""")),

    GQ("j02_salted_join", // skew-mitigated join: same results as plain join
      (s, dir) => graft.operators.SkewJoin.saltedJoin(
        t(s, dir, "lineitem"), t(s, dir, "orders"),
        "l_orderkey", "o_orderkey", salts = 8)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue")),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus""")),

    GQ("q47_disjunctive_pushdown", // TPC-H Q19 shape: OR-of-ANDs mixing
      // columns from BOTH join sides — the predicate-pushdown stress test.
      // Catalyst extracts the common-prefix conjuncts per side
      // (p_brand/p_size reach the part scan, l_quantity the lineitem scan
      // as an OR-of-ranges) while the cross-side residual stays on the
      // join — wrong engines either push nothing or push too much.
      // Revenue through exact DECIMAL(18,4) (the Dec contract).
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        l.join(p, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
              && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
              && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)
              && col("l_quantity").between(20, 30)))
          .agg(count(lit(1)).as("n"),
            sum(discPrice(col("l_extendedprice"), col("l_discount")))
              .cast("double").as("revenue"))
      },
      Some("""SELECT COUNT(*) AS n,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")),

    GQ("q48_min_cost_supplier", // TPC-H Q2 shape: correlated SCALAR AGG
      // subquery over a multi-join — the decorrelation stress test. The
      // inner min() re-joins lineitem/supplier/nation/region correlated on
      // p_partkey; Catalyst's RewriteCorrelatedScalarSubquery turns it into
      // a per-partkey aggregate + join (never a per-row re-execution), and
      // the nation/region dims broadcast inside BOTH the outer join tree
      // and the rewritten subquery. Price equality compares raw parquet
      // doubles against min() of the same raw values — no arithmetic, so
      // float equality is exact on both engines.
      (s, dir) => {
        Seq("part", "lineitem", "supplier", "nation", "region")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name,
            n_name AS supp_nation, l_extendedprice AS best_price
          FROM part
          JOIN lineitem ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE' AND p_size < 10
            AND l_extendedprice = (
              SELECT min(l2.l_extendedprice)
              FROM lineitem l2
              JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""")
      },
      Some("""SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name,
            n_name AS supp_nation, l_extendedprice AS best_price
          FROM part
          JOIN lineitem ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE' AND p_size < 10
            AND l_extendedprice = (
              SELECT min(l2.l_extendedprice)
              FROM lineitem l2
              JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""")),

    GQ("q49_lone_late_supplier", // TPC-H Q21 shape: EXISTS + NOT EXISTS
      // double correlation, rewritten Spark-first. The classic form runs a
      // semi-join (another supplier on the order) AND an anti-join (no
      // OTHER late supplier) — two more passes over the fact table. Over
      // per-order groups both quantifiers collapse to distinct counts:
      // EXISTS(other supp) ⇔ count(DISTINCT supp) ≥ 2, and for a late row
      // NOT EXISTS(other late supp) ⇔ count(DISTINCT late supp) = 1. Both
      // counts come from collect_set windows partitioned on l_orderkey —
      // the SAME key the lineitem⋈orders join shuffles on, so the windows
      // reuse the join's partitioning and the whole query costs ONE fact
      // exchange. Set sizes are bounded by lines-per-order (~7), never
      // corpus-scale. "Late" (ship > order + 180 days) is derived
      // per-row, so the oracle can replay the EXISTS form verbatim and
      // confirm the rewrite's equivalence.
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
        val w = Window.partitionBy(col("l_orderkey"))
        li.withColumn("nsupp", size(collect_set(col("l_suppkey")).over(w)))
          .withColumn("nlate",
            size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
          .filter(col("late") && col("nsupp") >= 2 && col("nlate") === 1)
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
      },
      Some("""WITH li AS (
          SELECT l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
                      THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F')
        SELECT s_name, count(*) AS numwait
        FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.late = 1
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late = 1)
        GROUP BY s_name""")),

    GQ("q50_sales_opportunity", // TPC-H Q22 shape: global scalar threshold
      // + NOT EXISTS, per-segment rollup. Customers above the positive-
      // balance average with no urgent order: the threshold is ONE
      // broadcast row (decimal-exact sum / count, so the double it casts
      // to is bit-identical on both engines), the NOT EXISTS compiles to a
      // left-anti join against the filtered orders projection — at scale
      // that's one shuffle of two key columns, and AQE broadcasts the
      // surviving customer side when the balance filter is selective.
      (s, dir) => {
        val c = t(s, dir, "customer")
        val thr = c.filter(col("c_acctbal") > 0.0)
          .agg(davg(col("c_acctbal")).as("avg_bal"))
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        c.join(broadcast(thr))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(c_acctbal)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment""")),

    GQ("q51_important_brands", // TPC-H Q11 shape: HAVING against a scalar
      // fraction of the global total. Both sides of the comparison stay
      // EXACT decimals all the way — the 4.05% threshold is the integer
      // cross-multiplication val·10000 > total·405, so no division or
      // double rounds differently across engines. The total comes from an
      // empty-partition window OVER the 25 aggregated brand rows — a
      // naive `v.crossJoin(v.agg(sum))` plans the lineitem⋈part aggregate
      // TWICE (no exchange reuse in the static plan); the window keeps
      // the fact side scanned exactly once, and its single partition is
      // bounded by the constant brand count, never data volume.
      // Overflow headroom: the window sum is DECIMAL(38,4), so tot·10⁴
      // (the wider side) overflows — returning null and silently dropping
      // every brand under non-ANSI mode — only past ~10³⁰ in summed
      // revenue; worldwide lineitem revenue at SF10⁶ is ~10¹⁶, fourteen
      // orders of magnitude of headroom. If the engine ever runs with
      // values near that bound, switch the comparison to
      // val.cast(DECIMAL(38,8))/tot > 0.0405 and accept the division ULP.
      (s, dir) => {
        val v = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).as("val"))
        v.withColumn("tot", sum(col("val")).over(Window.partitionBy()))
          .filter(col("val") * 10000 > col("tot") * 405)
          .select(col("p_brand"), col("val").cast("double").as("brand_value"))
      },
      Some("""WITH v AS (
          SELECT p_brand,
                 SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS val
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand)
        SELECT p_brand, CAST(val AS DOUBLE) AS brand_value
        FROM v WHERE val * 10000 > (SELECT SUM(val) * 405 FROM v)""")),

    GQ("q52_top_supplier", // TPC-H Q15 shape: agg view + max-equality
      // scalar subquery. Supplier revenue over one shipdate year, keep the
      // supplier(s) achieving the maximum. Revenue sums are exact
      // DECIMAL(18,4) so the = max() comparison is engine-independent
      // (the double cast happens only in the output projection). The max
      // comes from an empty-partition window over the PER-SUPPLIER
      // aggregate rows — the `rev.agg(max)` scalar form plans the fact
      // aggregate twice (no static exchange reuse). The window's single
      // partition holds one narrow row per supplier (dimension
      // cardinality, not fact volume); if even that is too hot, persist
      // rev and take the scalar — ties all survive either way.
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).as("total_rev"))
          .withColumn("max_rev", max(col("total_rev")).over(Window.partitionBy()))
          .filter(col("total_rev") === col("max_rev"))
        t(s, dir, "supplier")
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
      },
      Some("""WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""")),

    GQ("q53_small_qty_revenue", // TPC-H Q17 shape: correlated AVG threshold
      // per part — revenue of below-one-fifth-of-average-quantity lines.
      // The classic correlated form re-aggregates lineitem per outer row;
      // here the per-part average rides a window OVER THE SAME broadcast-
      // joined scan, so lineitem is read exactly once (EntrySpec-asserted)
      // and the only exchange is the window's partkey hash. The 0.2·avg
      // threshold is the integer cross-multiplication 5·qty·cnt < sum —
      // quantities are integral, and integral doubles add exactly, so the
      // comparison is engine-exact with no decimal machinery. Revenue sums
      // through DECIMAL(18,2) (the Dec contract); /7.0 happens once in
      // double on the single output row, identical on both engines.
      (s, dir) => {
        val p = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#4" && col("p_size") < 20)
          .select("p_partkey")
        val w = Window.partitionBy(col("l_partkey"))
        t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("wsum", sum(col("l_quantity")).over(w))
          .withColumn("wcnt", count(lit(1)).over(w))
          .filter(col("l_quantity") * 5 * col("wcnt") < col("wsum"))
          .agg((Dec.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      },
      Some("""WITH j AS (
          SELECT l_quantity, l_extendedprice,
                 SUM(l_quantity) OVER (PARTITION BY l_partkey) AS wsum,
                 COUNT(*) OVER (PARTITION BY l_partkey) AS wcnt
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#4' AND p_size < 20)
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM j WHERE 5 * l_quantity * wcnt < wsum""")),

    GQ("q54_large_orders", // TPC-H Q18 shape: HAVING-sum semi filter on the
      // fact key, top-100 by order value. The textbook form runs the
      // GROUP BY inside an IN-subquery and re-scans lineitem for the outer
      // per-order sum; here the qualifying orders AND their totals come
      // from one aggregate (874 survivors of 60k orders at sf0.01), which
      // then joins the narrow dims — lineitem is scanned once
      // (EntrySpec-asserted) and the dims join against a table five
      // thousand times smaller than the fact. Quantity sums are integral
      // doubles (exact); the limit is fully tiebroken (totalprice desc,
      // orderdate, unique orderkey) so both engines keep the same 100. */
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 200)
        big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate"),
            col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH q AS (
          SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 200)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               total_qty
        FROM q JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""")),

    GQ("q55_dominant_supplier", // TPC-H Q20 shape: semi-join on DERIVED
      // quantities (no partsupp table in this schema, so "availqty vs half
      // of shipped" becomes "supplier shipped more than half a part's 1996
      // volume, and materially so"). The derived table is a one-scan
      // aggregate over the year's lineitem; the per-part total rides a
      // window over the AGGREGATED (part, supplier) rows — fact volume
      // crosses one exchange, the window and dominance filter see only
      // dimension-cardinality rows. Suppliers semi-join the (tiny,
      // broadcast) dominant set: 23 of 100 qualify at sf0.01, 21 of 1000
      // at sf0.1 — selective in both directions, never vacuous. The
      // dominance test is integer-exact (2·sq > tq over integral-double
      // sums); the oracle replays the IN-subquery form to pin equivalence.
      (s, dir) => {
        val g = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(col("l_quantity")).as("supp_qty"))
        val dom = g
          .withColumn("part_qty",
            sum(col("supp_qty")).over(Window.partitionBy(col("l_partkey"))))
          .filter(col("supp_qty") * 2 > col("part_qty") &&
            col("supp_qty") >= 60)
          .select("l_suppkey")
        t(s, dir, "supplier")
          .join(dom, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name", "s_acctbal")
      },
      Some("""WITH g AS (
          SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2),
        w AS (SELECT *, SUM(sq) OVER (PARTITION BY l_partkey) AS tq FROM g)
        SELECT s_suppkey, s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN
          (SELECT l_suppkey FROM w WHERE 2 * sq > tq AND sq >= 60)""")),

    // ------------------------------------------------------------------
    // The remaining eight TPC-H query shapes (Q4/Q5/Q6/Q9/Q12/Q13/Q14/Q16)
    // — with q01/q34-36/q44/q47-55 this completes all 22. Schema
    // adaptations (no l_commitdate/l_receiptdate/l_shipmode/partsupp):
    // "late" = shipped > N days after the order date; Q9's supplycost =
    // p_retailprice as the unit-cost surrogate; Q16's supplier-part
    // relation comes from lineitem's (l_partkey, l_suppkey) pairs and
    // "complaints" = negative account balance. Each keeps its shape's
    // distinctive plan pattern — that's what these exercise.
    // ------------------------------------------------------------------

    GQ("q56_priority_check", // TPC-H Q4 shape: EXISTS semi join with a
      // non-equi residual (the late-shipment test compares both sides'
      // columns), counted per priority. The semi join keeps the orders
      // scan from ever duplicating rows — a plain inner join + distinct
      // would shuffle the multiplicity out again.
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(li, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority""")),

    GQ("q57_local_supplier_revenue", // TPC-H Q5 shape: 6-table star where
      // the supplier join carries the LOCALITY residual c_nationkey =
      // s_nationkey — the one TPC-H join that correlates two dimension
      // paths through the fact row. nation/region broadcast (fixed size);
      // the fact shuffles once for lineitem⋈orders; everything downstream
      // is broadcast edges.
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        t(s, dir, "lineitem")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name""")),

    GQ("q58_forecast_revenue", // TPC-H Q6 shape: the pure scan-aggregate —
      // every predicate pushes to the parquet scan, no join, no window;
      // the plan IS one WholeStageCodegen span over the filtered scan.
      // revenue = Σ price·discount in exact decimal.
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum((dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast(D4)).cast("double").as("revenue"))
      },
      Some("""SELECT
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    GQ("q59_late_priority_mix", // TPC-H Q12 shape: join + conditional
      // two-way counts (high/low priority among late shipments), grouped
      // by a lineitem attribute. The CASE counts ride the same aggregate
      // — one fact exchange, no second pass per priority class.
      (s, dir) => {
        val o = t(s, dir, "orders")
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(o, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
      },
      Some("""SELECT l_returnflag,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag""")),

    GQ("q60_promo_share", // TPC-H Q14 shape: conditional revenue share
      // over one shipdate month — part joins the filtered fact slice (AQE
      // broadcasts while small, SMJ at scale); the share is ONE division
      // of two decimal-exact sums (q44's discipline).
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
                discPrice(col("l_extendedprice"), col("l_discount")))
              .otherwise(lit(0).cast(D4))).cast("double").as("promo_revenue"),
            sum(discPrice(col("l_extendedprice"), col("l_discount")))
              .cast("double").as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            (col("promo_revenue") * 100.0 / col("total_revenue"))
              .as("promo_share"))
      },
      Some("""WITH a AS (SELECT
          CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01')
        SELECT promo_revenue, total_revenue,
          promo_revenue * 100.0 / total_revenue AS promo_share
        FROM a""")),

    GQ("q61_cust_distribution", // TPC-H Q13 shape: LEFT OUTER join with
      // the filter INSIDE the join condition (moving it to WHERE would
      // turn the outer join inner and drop the zero-order customers the
      // query exists to count), then a two-level aggregate: orders per
      // customer → customers per order-count. The histogram's second
      // exchange moves only count-cardinality rows.
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select("o_orderkey", "o_custkey")
        t(s, dir, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""WITH co AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey
            AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey)
        SELECT c_count, COUNT(*) AS custdist
        FROM co GROUP BY c_count""")),

    GQ("q62_nation_profit", // TPC-H Q9 shape: profit per (nation, year)
      // over the part⋈lineitem⋈orders⋈supplier⋈nation star; supplycost
      // surrogate = p_retailprice per unit (no partsupp table). amount =
      // disc revenue − cost, both exact scale-4 decimals, so the per-group
      // sum is order-free; the p_name LIKE filter prunes the part side
      // before the join.
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_name").contains("g"))
          .select("p_partkey", "p_retailprice")
        val n = broadcast(t(s, dir, "nation"))
        t(s, dir, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .withColumn("amount",
            discPrice(col("l_extendedprice"), col("l_discount")) -
              (dec(col("p_retailprice")) * dec(col("l_quantity"))).cast(D4))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(col("amount")).cast("double").as("profit"))
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
          CAST(SUM(
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
            - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
          ) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%g%'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate)""")),

    GQ("q63_supplier_cnt", // TPC-H Q16 shape: COUNT(DISTINCT supplier)
      // per part attribute with a NOT IN exclusion. The supplier-part
      // relation is lineitem's (l_partkey, l_suppkey) pairs; "complaint"
      // suppliers = negative balance, a null-free tiny set → the NOT IN
      // legitimately plans as one broadcast anti join (q50's rule). The
      // distinct rides the aggregate — no separate dedup pass.
      (s, dir) => {
        val p = t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#9" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        val complaints = broadcast(t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey"))
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
          .join(complaints, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size,
          COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size""")),

    GQ("z01_zorder_index", // Z-order data-layout index (`Layout
      // .mortonValue`): the Morton interleave of rank-scaled
      // (l_partkey, l_suppkey) — the value `Layout.zorderWrite`
      // range-partitions on so every output file covers a compact
      // 2-D rectangle and conjunctive box predicates skip files on BOTH
      // columns (locality A/B in LayoutSpec). Scale = ((v−min)·255) DIV
      // (max−min), interleave = literal shifts — all integer, so the
      // oracle replays the curve bit-exactly; min/max come from one
      // 1-row aggregate broadcast onto the scan. The dump is a 1%-of-
      // orders slice; the statistics are the FULL table's.
      (s, dir) => graft.operators.Layout.mortonValue(
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          Seq("l_partkey", "l_suppkey"), bits = 8)
        .filter(col("l_orderkey") % 100 === 0)
        .select("l_orderkey", "l_linenumber", "z_val"),
      Some("""WITH mm AS (SELECT
            CAST(MIN(l_partkey) AS BIGINT) AS mnp,
            CAST(MAX(l_partkey) AS BIGINT) AS mxp,
            CAST(MIN(l_suppkey) AS BIGINT) AS mns,
            CAST(MAX(l_suppkey) AS BIGINT) AS mxs
          FROM lineitem),
        s AS (SELECT l_orderkey, l_linenumber,
            CASE WHEN mxp = mnp THEN 0 ELSE
              ((CAST(l_partkey AS BIGINT) - mnp) * 255) // (mxp - mnp) END AS xi,
            CASE WHEN mxs = mns THEN 0 ELSE
              ((CAST(l_suppkey AS BIGINT) - mns) * 255) // (mxs - mns) END AS yi
          FROM lineitem, mm
          WHERE l_orderkey % 100 = 0)
        SELECT l_orderkey, l_linenumber,
          CAST(list_sum(list_transform(range(0, 8), j ->
            (((xi >> j) & 1) << (2*j)) + (((yi >> j) & 1) << (2*j + 1))))
            AS BIGINT) AS z_val
        FROM s""")),

    GQ("z06_hilbert_index", // HILBERT-curve layout index
      // (`Layout.hilbertValue` — Hilbert 1891; Faloutsos & Roseman 1989
      // for why: consecutive Hilbert cells are ALWAYS grid-neighbors
      // where Morton takes a long diagonal jump at every quadrant
      // boundary, so range partitions cut from the Hilbert order are
      // rounder rectangles — z01 and this query are the two ends of the
      // classic locality trade, spec-proven: Hilbert order-3 walk has
      // 64/64 adjacent steps, Morton 22 jumps). Same rank-scaling and
      // slice as z01 for direct comparability. The xy2d walk is a
      // sequential per-bit recurrence → the aggregate-HOF fold with
      // (x, y, d) PACKED into one BIGINT (struct accumulators measured
      // miscompiled out of DuckDB 1.0 lambda folds — the scalar pack is
      // the engine-portable form); n-based rotation keeps coordinates
      // non-negative mid-fold (the s-based variant walks negative,
      // measured, which would poison the pack). Oracle replays the
      // identical fold via list_reduce.
      (s, dir) => graft.operators.Layout.hilbertValue(
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          Seq("l_partkey", "l_suppkey"), bits = 8)
        .filter(col("l_orderkey") % 100 === 0)
        .select("l_orderkey", "l_linenumber", "h_val"),
      Some("""WITH mm AS (SELECT
            CAST(MIN(l_partkey) AS BIGINT) AS mnp,
            CAST(MAX(l_partkey) AS BIGINT) AS mxp,
            CAST(MIN(l_suppkey) AS BIGINT) AS mns,
            CAST(MAX(l_suppkey) AS BIGINT) AS mxs
          FROM lineitem),
        s AS (SELECT l_orderkey, l_linenumber,
            CASE WHEN mxp = mnp THEN 0 ELSE
              ((CAST(l_partkey AS BIGINT) - mnp) * 255) // (mxp - mnp) END AS xi,
            CASE WHEN mxs = mns THEN 0 ELSE
              ((CAST(l_suppkey AS BIGINT) - mns) * 255) // (mxs - mns) END AS yi
          FROM lineitem, mm
          WHERE l_orderkey % 100 = 0)
        SELECT l_orderkey, l_linenumber,
          list_reduce(
            list_prepend(CAST(xi AS BIGINT) * 256 + yi,
              list_transform(range(7, -1, -1), k -> CAST(1 AS BIGINT) << k)),
            (acc, s) ->
              (((acc // 65536) + s * s * (CASE WHEN (((acc // 256) % 256) & s) = 0
                    THEN (CASE WHEN ((acc % 256) & s) <> 0 THEN 1 ELSE 0 END)
                    ELSE (CASE WHEN ((acc % 256) & s) <> 0 THEN 2 ELSE 3 END) END)
               ) * 256
               + (CASE WHEN ((acc % 256) & s) <> 0 THEN (acc // 256) % 256
                   WHEN (((acc // 256) % 256) & s) <> 0 THEN 255 - (acc % 256)
                   ELSE acc % 256 END)
              ) * 256
              + (CASE WHEN ((acc % 256) & s) <> 0 THEN acc % 256
                  WHEN (((acc // 256) % 256) & s) <> 0 THEN 255 - (acc // 256) % 256
                  ELSE (acc // 256) % 256 END)
          ) // 65536 AS h_val
        FROM s""")),

    GQ("pp01_partition_prune", // STATIC partition pruning — the single
      // biggest 100 TB scan lever, bigger than Z-order: orders live in a
      // hive-partitioned layout (o_year=YYYY directories, written once by
      // `Sinks.parquetPartitioned`), and the year predicate is resolved
      // against the directory LISTING at planning time — the scan's
      // PartitionFilters (plan-asserted in EntrySpec) — so every other
      // year's files are never opened, never footer-read, never counted.
      // Z-order (z01) skips row-groups via min/max stats INSIDE files;
      // partition pruning skips whole directories before any IO. The
      // oracle replays over the unpartitioned table: layout must never
      // change answers.
      (s, dir) => {
        s.read.parquet(ordersByYear(s, dir))
          .filter(col("o_year") === 1995)
          .groupBy(month(col("o_orderdate")).as("o_month"))
          .agg(Dec.dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_orders
        FROM orders WHERE year(o_orderdate) = 1995
        GROUP BY 1""")),

    GQ("pp02_dpp_join", // DYNAMIC partition pruning — the join-time form
      // of pp01: customer is partitioned by c_nationkey, the filter lives
      // on the OTHER side of the join (region name → nation keys), so no
      // static predicate touches the partition column at all. Catalyst's
      // PartitionPruning rule injects a DynamicPruningExpression into the
      // customer scan that reuses the broadcast dim join's build side as
      // the partition filter (plan-asserted in EntrySpec) — at 100 TB the
      // fact scan reads only the partitions the filtered dim actually
      // names, without the user ever writing a partition predicate. The
      // dims stay broadcast (tiny); the fact never shuffles before the
      // pruned scan.
      (s, dir) => {
        val c = s.read.parquet(customerByNation(s, dir))
        val dim = t(s, dir, "nation").join(
          broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        c.join(dim, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_custs"),
            Dec.dsum(col("c_acctbal")).as("total_acctbal"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_custs,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY n_name""")),

    GQ("u01_merge_upsert", // MERGE INTO on a plain partitioned layout —
      // copy-on-write upsert (`operators/Merge`): a 1996 change batch
      // (every 7th order's price bumped, every 97th re-keyed as an insert)
      // is committed by rewriting ONLY the yr=1996 directory; 1995 files
      // are untouched (spec-asserted by mtime in MergeSpec). The query
      // reads the POST-merge table for both years — the oracle replays
      // target-anti-join-batch ∪ batch over the unpartitioned originals,
      // so the committed layout must equal the declarative MERGE result,
      // updates, inserts, untouched partitions and all. At 100 TB this is
      // the |today|-not-|history| ingest contract with row-level edits.
      (s, dir) => {
        s.read.parquet(mergedOrders(s, dir))
          .filter(col("o_year").isin(1995, 1996))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"),
            sum(when(col("o_orderkey") > 1000000000L, 1L).otherwise(0L))
              .as("n_inserted"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_totalprice,
            CAST(year(o_orderdate) AS INTEGER) AS o_year FROM orders),
        upd AS (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, o_year
                FROM base WHERE o_year = 1996 AND o_orderkey % 7 = 0),
        ins AS (SELECT o_orderkey + 1000000000 AS o_orderkey, o_totalprice, o_year
                FROM base WHERE o_year = 1996 AND o_orderkey % 97 = 0),
        final AS (
          SELECT * FROM base WHERE NOT (o_year = 1996 AND o_orderkey % 7 = 0)
          UNION ALL SELECT * FROM upd
          UNION ALL SELECT * FROM ins)
        SELECT o_year, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          CAST(SUM(CASE WHEN o_orderkey > 1000000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_inserted
        FROM final WHERE o_year IN (1995, 1996) GROUP BY 1""")),

    GQ("u02_merge_delete", // the delete side of MERGE — the GDPR-purge
      // shape: every 5th 1997 order deleted BY KEY, keys shipped with
      // their partition values so only yr=1997 is read and rewritten
      // (`operators/Merge.delete`; a fully-emptied directory is removed
      // explicitly — dynamic partition overwrite cannot express "replace
      // with nothing", the operator's documented blind-spot fix). The
      // oracle replays the NOT-matched filter over the originals: the
      // committed post-delete layout must equal the declarative answer.
      (s, dir) => {
        s.read.parquet(purgedOrders(s, dir))
          .filter(col("o_year").isin(1996, 1997))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
          AND NOT (year(o_orderdate) = 1997 AND o_orderkey % 5 = 0)
        GROUP BY 1""")),

    GQ("pp03_agg_pushdown", // parquet AGGREGATE pushdown — the third scan
      // lever after directory pruning (pp01/pp02) and row-group skipping
      // (z01): MIN/MAX/COUNT with no data filter answer from the parquet
      // FOOTER statistics alone — zero row groups decompressed, zero rows
      // materialized; at 100 TB the difference between a metadata read
      // and a full table scan for the exact same answer. The plan guard
      // (EntrySpec) asserts PushedAggregation on the scan node. Runs in a
      // child session (`newSession` shares the context, isolates conf) so
      // the opt-in flag never leaks into other queries' plans.
      (s, dir) => {
        val ns = s.newSession()
        ns.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        // pushdown lives in the V2 ParquetScanBuilder; parquet defaults to
        // the V1 path, so take it off the V1 list for this child session
        ns.conf.set("spark.sql.sources.useV1SourceList",
          "avro,csv,json,kafka,orc,text")
        // timestamp columns are outside parquet's pushdown-supported type
        // set (one unsupported column abandons the whole pushdown), so the
        // probe sticks to bigint/double stats
        ns.read.parquet(s"$dir/orders.parquet")
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
      },
      Some("""SELECT COUNT(*) AS n_orders,
          MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
          MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        FROM orders""")),

    GQ("sv01_schema_evolution", // additive schema evolution — the only
      // schema change that is O(0) at 100 TB: the 1996 ingest generation
      // added `o_channel`, the 1995 files were NEVER rewritten, and the
      // reader reconciles the generations with parquet schema merging
      // (mergeSchema=true pays one footer read per file — at scale, pin
      // the merged schema in a catalog and pass it instead). Old rows
      // surface NULL for the new column; the query counts exactly which
      // rows carry it. The oracle replays generation membership from the
      // originals: evolution must change no existing value.
      (s, dir) => {
        s.read.option("mergeSchema", "true")
          .parquet(evolvedOrders(s, dir))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            count(col("o_channel")).as("n_channel_rows"),
            sum(when(col("o_channel") === "web", 1L).otherwise(0L)).as("n_web"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_channel_rows,
          CAST(SUM(CASE WHEN year(o_orderdate) = 1996 AND o_orderkey % 3 = 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_web
        FROM orders WHERE year(o_orderdate) IN (1995, 1996) GROUP BY 1""")),

    GQ("mv01_incremental_rollup", // materialized-view maintenance — the
      // stored monthly revenue rollup is kept current by INCREMENTAL
      // refresh: when the delta batch lands, only the months it touches
      // are recomputed (one month's scan, not history's) and upserted
      // into the rollup through `operators/Merge` keyed (o_year,
      // o_month) — the stale partial-month row is REPLACED, never
      // double-counted. The oracle recomputes the whole rollup from the
      // raw originals: incremental maintenance must be indistinguishable
      // from recompute — THE invariant that makes stored aggregates
      // trustworthy at 100 TB (where recompute is not an option).
      (s, dir) => {
        s.read.parquet(rollupOrders(s, dir))
          .select("o_year", "o_month", "n_orders", "revenue")
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          CAST(month(o_orderdate) AS INTEGER) AS o_month,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1, 2""")),

    GQ("z02_manifest_skip", // per-file min/max STATS MANIFEST — the
      // stored-artifact form of file skipping (`operators/FileManifest`):
      // parquet footers already skip row groups, but the footer is a
      // per-file open — 10^6 files = 10^6 metadata reads per query. The
      // manifest is ONE KB-scale table scanned once; only intersecting
      // files are handed to the reader. Composes with z01: z-order makes
      // the per-file ranges tight (that's where the selectivity comes
      // from), the manifest makes them consultable without touching the
      // files. FileManifestSpec asserts the skip counts + row-identity;
      // the oracle replays the filter over the plain table — stats must
      // never change answers.
      (s, dir) => {
        val root = manifestOrders(s, dir)
        val (df, _) = graft.operators.FileManifest.prunedRead(
          s, s"$root/t", s"$root/m", Seq(("o_custkey", 10L, 99L)))
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders WHERE o_custkey BETWEEN 10 AND 99
        GROUP BY 1""")),

    GQ("z03_manifest_count", // pruning-aware COUNT: files the manifest
      // proves FULLY contained contribute their stored n_rows without
      // being opened; only the two boundary files are scanned — at scale
      // a count over a clustered column is a metadata read plus the range
      // edges, the same trick a table format's planner plays. NULL-stats
      // files always scan (never counted for free). Oracle recomputes
      // over the plain table: stats may only move work, never answers.
      (s, dir) => {
        val root = manifestOrders(s, dir)
        val (n, _) = graft.operators.FileManifest.countFast(
          s, s"$root/t", s"$root/m", Seq(("o_custkey", 10L, 99L)))
        s.range(1).select(lit(n).as("n_orders"))
      },
      Some("""SELECT COUNT(*) AS n_orders FROM orders
        WHERE o_custkey BETWEEN 10 AND 99""")),

    GQ("z04_bloom_lookup", // per-file BLOOM index for point lookups:
      // o_orderkey is unique per row and the z-interleave scatters its
      // range across every file, so min/max stats keep ~all files for a
      // key probe; each file's bloom (engine BloomFilterAggregate,
      // xxhash64-keyed) answers membership instead — no false negatives
      // (a present key's file always survives), false positives only
      // cost an extra file scan. The membership test runs ON the
      // manifest scan; blooms never leave the executors. Oracle replays
      // the IN-list over the plain table.
      (s, dir) => {
        val root = manifestOrders(s, dir)
        val (df, _) = graft.operators.FileManifest.prunedReadPoint(
          s, s"$root/t", s"$root/mb", "o_orderkey", Seq(17L, 423L, 1001L))
        df.select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderkey IN (17, 423, 1001)""")),

    GQ("z05_merge_manifest_fresh", // the MERGE × MANIFEST composition —
      // manifest freshness as a MECHANISM, not a manual contract: the
      // stats manifest is built before the merge, and the COW commit
      // itself refreshes it (`Merge.upsert(manifestPath)` →
      // `FileManifest.refresh` inside the commit, delta-sized — stats
      // recomputed only for the rewritten directories' new files, via
      // join-based membership, never an In-literal list). The query then
      // range-prunes THROUGH the refreshed manifest over the post-merge
      // table: with a stale manifest this read would either throw on the
      // vanished pre-merge files or silently miss every rewritten 1996
      // row — the oracle replays the declarative MERGE + filter over the
      // originals, so the committed-layout/manifest pair must equal it
      // exactly. At 100 TB this is the invariant that makes a stored file
      // index trustworthy across daily ingest: every commit leaves the
      // index consistent, the same reason table formats commit data and
      // manifest atomically.
      (s, dir) => {
        val root = mergedManifestOrders(s, dir)
        val (df, _) = graft.operators.FileManifest.prunedRead(
          s, s"$root/t", s"$root/m", Seq(("o_custkey", 10L, 99L)))
        df.groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"),
            sum(when(col("o_orderkey") > 1000000000L, 1L).otherwise(0L))
              .as("n_inserted"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice,
            CAST(year(o_orderdate) AS INTEGER) AS o_year FROM orders),
        upd AS (SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice,
                  o_year FROM base WHERE o_year = 1996 AND o_orderkey % 7 = 0),
        ins AS (SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                  o_totalprice, o_year
                FROM base WHERE o_year = 1996 AND o_orderkey % 97 = 0),
        final AS (
          SELECT * FROM base WHERE NOT (o_year = 1996 AND o_orderkey % 7 = 0)
          UNION ALL SELECT * FROM upd
          UNION ALL SELECT * FROM ins)
        SELECT o_year, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          CAST(SUM(CASE WHEN o_orderkey > 1000000000 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_inserted
        FROM final WHERE o_custkey BETWEEN 10 AND 99 GROUP BY 1""")),

    GQ("ag01_majority_vote", // annotation aggregation (`operators/
      // Agreement`): redundant human labels collapsed to one per item by
      // majority vote — the RLHF/gold-set adjudication step. Events stand
      // in as the annotation log (item = event_id mod 500, annotator =
      // user_id, label = event_type); duplicate submissions per
      // (item, annotator) reduce to the deterministic minimum first. Ties
      // break to the lexicographically smallest label, per-item pairwise
      // agreement is floored to integer millionths — every choice the
      // oracle replays bit-for-bit. Scale shape: two key-bounded groupBys
      // + a rank-1 window over ≤|label-vocab| rows per item.
      (s, dir) => {
        import graft.operators.Agreement
        val ann = Tables.events(s, dir).select(
          (col("event_id") % 500).as("item"),
          col("user_id").as("annotator"), col("event_type").as("label"))
        val one = Agreement.oneLabelPerAnnotator(ann, "item", "annotator", "label")
        Agreement.majorityVote(one, "item", "label")
          .groupBy("modal_label")
          .agg(count(lit(1)).as("n_items"),
            sum(col("n_annotations")).as("n_annotations"),
            Agreement.floorDiv(sum(col("agreement_millionths")), count(lit(1)))
              .as("mean_agreement_millionths"))
      },
      Some("""WITH ann AS (SELECT event_id % 500 AS item, user_id AS annotator,
                MIN(event_type) AS label FROM events GROUP BY 1, 2),
        v AS (SELECT item, label, COUNT(*) AS c FROM ann GROUP BY 1, 2),
        it AS (SELECT item, SUM(c) AS n, SUM(c * (c - 1)) AS pairs
               FROM v GROUP BY 1),
        modal AS (SELECT item, label AS modal_label,
                ROW_NUMBER() OVER (PARTITION BY item
                  ORDER BY c DESC, label ASC) AS rk FROM v),
        mj AS (SELECT i.item, i.n, m.modal_label,
               CASE WHEN i.n <= 1 THEN 1000000
                    ELSE (1000000 * i.pairs) // (i.n * (i.n - 1)) END AS agree_u
               FROM it i JOIN modal m ON i.item = m.item AND m.rk = 1)
        SELECT modal_label, COUNT(*) AS n_items,
          CAST(SUM(n) AS BIGINT) AS n_annotations,
          CAST(SUM(agree_u) // COUNT(*) AS BIGINT) AS mean_agreement_millionths
        FROM mj GROUP BY 1""")),

    GQ("ag02_fleiss_kappa", // corpus-level inter-annotator agreement —
      // chance-corrected kappa per Fleiss 1971 over items with ≥2
      // annotations, entirely in integer millionths: per-item agreement
      // terms floored before the mean (order-free), chance agreement from
      // label shares quantized BEFORE squaring (fits a long at any
      // annotation volume), and kappa's possibly-NEGATIVE ratio floored
      // via the explicit non-negative-mod formula — Spark `div` and
      // DuckDB `//` both truncate toward zero, so the naive spelling
      // silently disagrees exactly when annotators disagree. One
      // (item,label) groupBy chain reducing to 1-row aggregates: the
      // verdict costs the scan.
      (s, dir) => {
        import graft.operators.Agreement
        val ann = Tables.events(s, dir).select(
          (col("event_id") % 500).as("item"),
          col("user_id").as("annotator"), col("event_type").as("label"))
        Agreement.fleissKappa(
          Agreement.oneLabelPerAnnotator(ann, "item", "annotator", "label"),
          "item", "label")
      },
      Some("""WITH ann AS (SELECT event_id % 500 AS item, user_id AS annotator,
                MIN(event_type) AS label FROM events GROUP BY 1, 2),
        v AS (SELECT item, label, COUNT(*) AS c FROM ann GROUP BY 1, 2),
        it AS (SELECT item, SUM(c) AS n,
                 (1000000 * SUM(c * (c - 1))) // (SUM(c) * (SUM(c) - 1))
                   AS agree_u
               FROM v GROUP BY 1 HAVING SUM(c) >= 2),
        s AS (SELECT COUNT(*) AS m, SUM(agree_u) AS sa, SUM(n) AS nn FROM it),
        cj AS (SELECT v.label, SUM(v.c) AS cj FROM v
               JOIN it ON v.item = it.item GROUP BY 1),
        pe AS (SELECT SUM(((1000000 * cj) // (SELECT nn FROM s)) *
                          ((1000000 * cj) // (SELECT nn FROM s)))
                 // 1000000 AS pe_u FROM cj)
        SELECT CAST(s.m AS BIGINT) AS n_items,
          CAST(s.nn AS BIGINT) AS n_annotations,
          CAST(s.sa // s.m AS BIGINT) AS observed_millionths,
          CAST(pe.pe_u AS BIGINT) AS chance_millionths,
          CAST(CASE WHEN pe.pe_u >= 1000000 THEN NULL ELSE
            (1000000 * (s.sa // s.m - pe.pe_u)
              - ((1000000 * (s.sa // s.m - pe.pe_u)) % (1000000 - pe.pe_u)
                 + (1000000 - pe.pe_u)) % (1000000 - pe.pe_u))
            // (1000000 - pe.pe_u) END AS BIGINT) AS kappa_millionths
        FROM s, pe""")),

    GQ("ag03_bt_ranking", // BRADLEY–TERRY preference ranking
      // (`Agreement.bradleyTerry`, Bradley & Terry 1952 via Hunter 2004's
      // MM algorithm) — the RLHF preference-aggregation / arena-
      // leaderboard model: from pairwise "i beat j" counts, strengths
      // with P(i beats j) = s_i/(s_i+s_j). Preferences here are the
      // browse-graph transitions read as revealed preference (the item a
      // user moved TO beats the one moved FROM — g02's edges,
      // reinterpreted), so the corpus-scale half is one lag + one
      // key-bounded count; the MM fit runs on the |items|+|pairs|
      // planner-scale tables, 5 fixed rounds in integer millionths
      // (per-pair term floor(m·1e12/(s_i+s_j)), update floor(W·1e12/Σ),
      // never-winning items floor at 1 — all replayed by the oracle's
      // unrolled rounds). Each round's score table feeds BOTH pair
      // endpoints, so lineage truncates every round — without that the
      // plan doubles per round.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val prefs = ev
          .select(col("item").as("winner"),
            lag(col("item"), 1).over(w).as("loser"))
          .filter(col("loser").isNotNull)
          .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
        // 100 leaderboard items: the driver-side MM mode (identical
        // integer recurrence, spec-pinned bit-equal) skips 5 rounds of
        // job barriers; the distributed rounds remain for item universes
        // that don't fit a driver
        graft.operators.Agreement.bradleyTerry(prefs, iterations = 5,
          smallItemSet = true)
      },
      Some {
        val rounds = (1 to 5).map { r =>
          s"""d$r AS (SELECT m.i AS item,
              CAST(SUM((m.n * 1000000000000) // (sa.s + sb.s)) AS BIGINT) AS den
            FROM m JOIN s${r - 1} sa ON sa.item = m.i
                   JOIN s${r - 1} sb ON sb.item = m.j
            GROUP BY 1),
          s$r AS (SELECT b.item, CAST(GREATEST(1,
              CASE WHEN d.den IS NULL OR d.den = 0 THEN 1
                   ELSE (b.wins * 1000000000000) // d.den END) AS BIGINT) AS s
            FROM b LEFT JOIN d$r d ON d.item = b.item)"""
        }.mkString(",\n")
        s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
            CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS item
          FROM events),
        tr AS (SELECT item AS winner,
            LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS loser
          FROM ev),
        p AS (SELECT winner AS w, loser AS l, CAST(COUNT(*) AS BIGINT) AS n
          FROM tr WHERE loser IS NOT NULL AND winner <> loser GROUP BY 1, 2),
        wins AS (SELECT w AS item, CAST(SUM(n) AS BIGINT) AS wins
          FROM p GROUP BY 1),
        items AS (SELECT w AS item FROM p UNION SELECT l FROM p),
        m AS (SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM (
            SELECT w AS i, l AS j, n FROM p
            UNION ALL SELECT l AS i, w AS j, n FROM p)
          GROUP BY 1, 2),
        mt AS (SELECT i AS item, CAST(SUM(n) AS BIGINT) AS matches
          FROM m GROUP BY 1),
        b AS (SELECT items.item, COALESCE(wins.wins, 0) AS wins
          FROM items LEFT JOIN wins ON wins.item = items.item),
        s0 AS (SELECT item, CAST(1000000 AS BIGINT) AS s FROM b),
        $rounds
        SELECT b.item, CAST(b.wins AS BIGINT) AS wins,
          COALESCE(mt.matches, 0) AS matches, s5.s AS score_ppm
        FROM b LEFT JOIN mt ON mt.item = b.item
               JOIN s5 ON s5.item = b.item"""
      }),

    GQ("dq01_expectations", // declarative expectation suite
      // (`operators/Expectations`) — the ingest ADMISSION gate: the whole
      // contract (nullability, ranges, formats, domains, key uniqueness)
      // evaluates as ONE map-side-combined aggregate over the batch scan
      // (plan-asserted no-join; Unique adds the exact count-distinct
      // branch, the same exact-payload price x18 documents). Violations
      // are exact integer counts — the verdict replays bit-for-bit — and
      // the _row_count audit row makes a vacuously-passing empty batch
      // visible. The range expectation is deliberately violated here so
      // the gate is provably non-vacuous. Compose with Merge: validate,
      // then upsert.
      (s, dir) => {
        import graft.operators.Expectations._
        graft.operators.Expectations.check(t(s, dir, "orders"), Seq(
          NotNull("o_orderpriority"),
          InRange("o_totalprice", 0.0, 200000.0),
          MatchesRegex("o_orderpriority", "^[0-9]-[A-Z ]+$"),
          OneOf("o_orderstatus", Seq("F", "O", "P")),
          // conditional cross-field rule (r12): scoped to F orders, with
          // real violations on both sides of the scope — non-vacuous
          Implies("o_orderstatus = 'F'", "o_totalprice <= 150000.0"),
          Unique("o_orderkey")))
      },
      Some("""WITH v AS (
          SELECT 'not_null(o_orderpriority)' AS expectation,
            CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
          FROM orders
          UNION ALL
          SELECT 'in_range(o_totalprice,0.0,200000.0)',
            CAST(SUM(CASE WHEN o_totalprice IS NULL
              OR o_totalprice < 0.0 OR o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'matches_regex(o_orderpriority)',
            CAST(SUM(CASE WHEN o_orderpriority IS NULL
              OR NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$') THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'one_of(o_orderstatus)',
            CAST(SUM(CASE WHEN o_orderstatus IS NULL
              OR o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'implies(o_orderstatus = ''F'' -> o_totalprice <= 150000.0)',
            CAST(SUM(CASE WHEN o_orderstatus = 'F'
              AND NOT COALESCE(o_totalprice <= 150000.0, FALSE)
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'unique(o_orderkey)',
            CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT '_row_count', COUNT(*) FROM orders)
        SELECT expectation, COALESCE(violations, 0) AS violations,
          (expectation = '_row_count' OR COALESCE(violations, 0) = 0) AS passed
        FROM v""")),

    GQ("dq02_fk_integrity", // referential-integrity audit — the
      // expectation family's JOIN-shaped member (`Expectations
      // .checkWithRelations`): the scan suite still costs its one
      // aggregate pass, and each ForeignKey adds an anti-join count
      // branch — dim side reduced to DISTINCT keys (map-side combined),
      // fact side column-pruned to the fk alone, AQE broadcasting the
      // key set when it fits. NULL fks do not violate (SQL FK
      // semantics; compose NotNull when absence is illegal). The third
      // relation checks against "suppliers in good standing"
      // (s_acctbal >= 0) — a realistic business contract the data
      // genuinely violates, so the gate is provably non-vacuous.
      (s, dir) => {
        import graft.operators.Expectations._
        graft.operators.Expectations.checkWithRelations(
          t(s, dir, "lineitem"),
          Seq(NotNull("l_orderkey"), InRange("l_discount", 0.0, 0.1)),
          Seq(
            ForeignKey("l_orderkey", "orders", t(s, dir, "orders"), "o_orderkey"),
            ForeignKey("l_partkey", "part", t(s, dir, "part"), "p_partkey"),
            ForeignKey("l_suppkey", "solvent_supplier",
              t(s, dir, "supplier").filter(col("s_acctbal") >= 0), "s_suppkey")))
      },
      Some("""WITH v AS (
          SELECT 'not_null(l_orderkey)' AS expectation,
            CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
          FROM lineitem
          UNION ALL
          SELECT 'in_range(l_discount,0.0,0.1)',
            CAST(SUM(CASE WHEN l_discount IS NULL
              OR l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT '_row_count', COUNT(*) FROM lineitem
          UNION ALL
          SELECT 'foreign_key(l_orderkey->orders.o_orderkey)',
            CAST((SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
          UNION ALL
          SELECT 'foreign_key(l_partkey->part.p_partkey)',
            CAST((SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
          UNION ALL
          SELECT 'foreign_key(l_suppkey->solvent_supplier.s_suppkey)',
            CAST((SELECT COUNT(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM supplier su
                WHERE su.s_acctbal >= 0 AND su.s_suppkey = l.l_suppkey)) AS BIGINT))
        SELECT expectation, COALESCE(violations, 0) AS violations,
          (expectation = '_row_count' OR COALESCE(violations, 0) = 0) AS passed
        FROM v""")),

    GQ("dq03_small_cells", // k-anonymity small-cell suppression
      // (`operators/Privacy.suppressSmallCells`) — the PUBLISH-side
      // disclosure gate: cells of the per-(nation, segment) customer
      // aggregate with fewer than k=10 members fold into one
      // `__suppressed__` residual row, so no released row describes
      // fewer than 10 people while corpus totals are preserved exactly
      // (coarsened, never dropped). Measures stay DECIMAL through the
      // fold — the re-aggregation is exact, bit-replayable — and cast
      // to double only on release. Cost: the expensive groupBy is the
      // one the caller already pays; suppression re-aggregates the CELL
      // table (125 rows here, key-cardinality-bounded at any corpus
      // size). At sf0.01 both sides are exercised: cells run 5-21
      // members, so k=10 suppresses some and publishes the rest.
      (s, dir) => {
        val cells = t(s, dir, "customer")
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("c_acctbal").cast("decimal(18,2)")).as("bal"))
        graft.operators.Privacy
          .suppressSmallCells(cells, Seq("c_nationkey", "c_mktsegment"),
            "n_customers", k = 10)
          .select(col("c_nationkey"), col("c_mktsegment"),
            col("n_customers"), col("bal").cast("double").as("total_acctbal"))
      },
      Some("""WITH cells AS (
          SELECT CAST(c_nationkey AS VARCHAR) AS nk, c_mktsegment AS seg,
            COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
          FROM customer GROUP BY 1, 2),
        m AS (SELECT
            CASE WHEN n < 10 THEN '__suppressed__' ELSE nk END AS c_nationkey,
            CASE WHEN n < 10 THEN '__suppressed__' ELSE seg END AS c_mktsegment,
            n, bal FROM cells)
        SELECT c_nationkey, c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_customers,
          CAST(SUM(bal) AS DOUBLE) AS total_acctbal
        FROM m GROUP BY 1, 2""")),

    GQ("dq05_l_diversity", // l-diversity (Machanavajjhala et al. 2007)
      // over (`Privacy.lDiversityPublish`) — the leak k-anonymity leaves
      // open: a group can hold ≥ k people and still disclose if they all
      // share one sensitive value. Quasi-identifiers (nation, segment,
      // order year), sensitive attribute o_orderpriority, l=4: groups
      // carrying < 4 distinct priorities fold into one masked residual
      // whose OWN distinct count is recomputed over the union of the
      // suppressed cells (distinct doesn't sum — the residual's number
      // must be exact, not a sum of per-group distincts). ONE
      // corpus-scale aggregate — groupBy(QI, sensitive) — then all
      // privacy math runs on the cell table, bounded by |QI|×|domain| at
      // any corpus size. At sf0.01: 41 groups suppressed, 834 published.
      (s, dir) => {
        val rows0 = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nk"),
            col("c_mktsegment").as("seg"),
            year(col("o_orderdate")).as("yr"),
            col("o_orderpriority"))
        graft.operators.Privacy.lDiversityPublish(
          rows0, Seq("nk", "seg", "yr"), "o_orderpriority", l = 4)
      },
      Some("""WITH rows0 AS (
          SELECT CAST(c_nationkey AS VARCHAR) AS nk, c_mktsegment AS seg,
            CAST(year(o_orderdate) AS VARCHAR) AS yr,
            o_orderpriority AS sv
          FROM orders JOIN customer ON o_custkey = c_custkey),
        cells AS (SELECT nk, seg, yr, sv, CAST(COUNT(*) AS BIGINT) AS n
          FROM rows0 GROUP BY 1, 2, 3, 4),
        g AS (SELECT nk, seg, yr, CAST(SUM(n) AS BIGINT) AS n_rows,
            CAST(COUNT(*) AS BIGINT) AS n_distinct_sensitive
          FROM cells GROUP BY 1, 2, 3),
        div AS (SELECT * FROM g WHERE n_distinct_sensitive >= 4),
        sup AS (SELECT '__suppressed__' AS nk, '__suppressed__' AS seg,
            '__suppressed__' AS yr, CAST(SUM(n) AS BIGINT) AS n_rows,
            CAST(COUNT(DISTINCT sv) AS BIGINT) AS n_distinct_sensitive
          FROM cells c
          WHERE NOT EXISTS (SELECT 1 FROM div d
            WHERE d.nk = c.nk AND d.seg = c.seg AND d.yr = c.yr)
          HAVING SUM(n) IS NOT NULL)
        SELECT * FROM div UNION ALL SELECT * FROM sup""")),

    GQ("pv01_pseudonymize", // deterministic keyed pseudonymization
      // (`Privacy.pseudonymize`) — dq03's row-level sibling and d14's
      // structured-identifier complement: direct identifiers become
      // md5(secret|value) tokens, so they leave the published table while
      // JOINS STILL WORK — the same (secret, value) tokenizes identically
      // in every table, which is exactly what this query proves
      // end-to-end: revenue by market segment computed through a
      // TOKENIZED orders⋈customer join, with the distinct-token count
      // pinning that no two customers collided (128-bit tokens on
      // purpose; a 1e9-space hash birthday-merges identities around 30k
      // keys). Scan-local tokenization, zero extra shuffles over the
      // plain join.
      (s, dir) => {
        import graft.operators.Privacy
        val o = Privacy.pseudonymize(
          t(s, dir, "orders").select(col("o_custkey").as("cust"),
            col("o_totalprice")), Seq("cust"), "graft-release-1")
        val c = Privacy.pseudonymize(
          t(s, dir, "customer").select(col("c_custkey").as("cust"),
            col("c_mktsegment")), Seq("cust"), "graft-release-1")
        o.join(c, Seq("cust"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            countDistinct(col("cust")).as("n_tokens"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""WITH o AS (SELECT md5('graft-release-1|' || CAST(o_custkey AS VARCHAR))
                AS cust, o_totalprice FROM orders),
        c AS (SELECT md5('graft-release-1|' || CAST(c_custkey AS VARCHAR))
                AS cust, c_mktsegment FROM customer)
        SELECT c_mktsegment, COUNT(*) AS n_orders,
          CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM o JOIN c USING (cust) GROUP BY 1""")),

    GQ("x27_join_profile", // pre-flight JOIN cardinality & skew advisor
      // (`Profiler.joinProfile`): the check to run BEFORE committing a
      // 100 TB equi-join — exact output cardinality Σ cl·cr over matched
      // keys, matched/left-only/right-only key counts, and the largest
      // single-key contribution (the number that says whether j02's
      // salting or AQE skew-split is needed, and how wide). Each side
      // reduces map-side to its key histogram before anything crosses an
      // exchange: profiling shuffles histograms, never rows. NULL keys
      // never equi-match (SQL semantics) and land as unmatched groups.
      // Two realistic pairs: the FK-clean orders⋈lineitem and the
      // asymmetric events⋈orders (150 users vs 1500 customers — 90% of
      // the right key space unmatched), so every counter is non-vacuous.
      (s, dir) => {
        import graft.operators.Profiler
        val p1 = Profiler.joinProfile(t(s, dir, "orders"), "o_orderkey",
            t(s, dir, "lineitem"), "l_orderkey")
          .select(lit("orders_lineitem").as("pair"), col("*"))
        val p2 = Profiler.joinProfile(Tables.events(s, dir), "user_id",
            t(s, dir, "orders"), "o_custkey")
          .select(lit("events_orders").as("pair"), col("*"))
        p1.unionByName(p2)
      },
      Some("""WITH l1 AS (SELECT o_orderkey AS k, COUNT(*) AS c
                FROM orders GROUP BY 1),
        r1 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        j1 AS (SELECT l1.c AS cl, r1.c AS cr
               FROM l1 FULL OUTER JOIN r1 ON l1.k = r1.k),
        l2 AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
        r2 AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        j2 AS (SELECT l2.c AS cl, r2.c AS cr
               FROM l2 FULL OUTER JOIN r2 ON l2.k = r2.k)
        SELECT 'orders_lineitem' AS pair,
          CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
            THEN cl * cr ELSE 0 END) AS BIGINT) AS est_rows,
          CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_matched,
          CAST(SUM(CASE WHEN cr IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_keys_left_only,
          CAST(SUM(CASE WHEN cl IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_keys_right_only,
          CAST(MAX(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
            THEN cl * cr END) AS BIGINT) AS max_contribution
        FROM j1
        UNION ALL
        SELECT 'events_orders',
          CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
            THEN cl * cr ELSE 0 END) AS BIGINT),
          CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT),
          CAST(SUM(CASE WHEN cr IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(SUM(CASE WHEN cl IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(MAX(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
            THEN cl * cr END) AS BIGINT)
        FROM j2""")),

    GQ("dq06_t_closeness", // t-closeness audit (`Privacy.tClosenessAudit`
      // — Li, Li & Venkatasubramanian 2007), the third rung of the
      // disclosure ladder: dq03 bounds group SIZE, dq05 distinct
      // sensitive VALUES, and both still leak when a ≥k, ≥l group's
      // sensitive DISTRIBUTION skews far from the table's (a cell that
      // is 95% one status discloses plenty). Categorical sensitive attr
      // under the uniform ground distance ⇒ the paper's EMD reduces to
      // total variation distance, computed with x26's exact integer
      // arithmetic (per-value |o·Ng − g·No| longs, DECIMAL(38,0) final
      // division) so the verdict hash-replays. t = 1% (10000 ppm) over
      // (priority, year) cells vs the status distribution: splits
      // 9/35 publish at sf0.01 and 27/35 at sf0.1; at sf0.001 every
      // ~15-row group sits >1% away by sampling alone and ALL flag —
      // t-closeness behaving as designed on small cells (a small group
      // cannot demonstrate closeness), stated in the scaladoc.
      (s, dir) => graft.operators.Privacy.tClosenessAudit(
        t(s, dir, "orders").select(col("o_orderpriority"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          col("o_orderstatus")),
        Seq("o_orderpriority", "o_year"), "o_orderstatus",
        tMillionths = 10000L),
      Some("""WITH cells AS (SELECT o_orderpriority AS pri,
            CAST(CAST(year(o_orderdate) AS INTEGER) AS VARCHAR) AS yr,
            o_orderstatus AS sv, CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY 1, 2, 3),
        g AS (SELECT sv, CAST(SUM(n) AS BIGINT) AS gn FROM cells GROUP BY 1),
        ng AS (SELECT CAST(SUM(gn) AS BIGINT) AS ng FROM g),
        grp AS (SELECT pri, yr, CAST(SUM(n) AS BIGINT) AS no
          FROM cells GROUP BY 1, 2),
        grid AS (SELECT grp.pri, grp.yr, grp.no, g.sv, g.gn
          FROM grp CROSS JOIN g),
        ap AS (SELECT grid.pri, grid.yr, grid.no, grid.sv, grid.gn,
            COALESCE(cells.n, 0) AS o
          FROM grid LEFT JOIN cells
            ON grid.pri = cells.pri AND grid.yr = cells.yr
            AND grid.sv = cells.sv),
        s AS (SELECT pri, yr, no,
            CAST(SUM(abs(o * (SELECT ng FROM ng) - gn * no)) AS BIGINT) AS sm
          FROM ap GROUP BY 1, 2, 3)
        SELECT pri AS o_orderpriority, yr AS o_year, no AS n_rows,
          CAST((1000000 * sm) // (2 * no * (SELECT ng FROM ng)) AS BIGINT)
            AS tvd_millionths,
          CAST((1000000 * sm) // (2 * no * (SELECT ng FROM ng)) AS BIGINT)
            <= 10000 AS publish
        FROM s""")),

    GQ("dq04_fd_profile", // functional-dependency audit
      // (`Expectations.fdAudit`): the schema assumptions joins and dedup
      // keys silently rely on, made checkable — per declared FD the
      // determinant-group counts, groups carrying >1 dependent value, and
      // the g3'-style confidence (row share a minimal repair keeps,
      // Kivinen & Mannila 1995) in exact integer millionths. doc_id→source
      // holds (a key determines everything); source→lang and lang→source
      // are genuinely violated in the corpus, so the confidence arithmetic
      // is non-vacuous in both directions. Two key-bounded shuffles per
      // FD, verdicts union into one gateable report.
      (s, dir) => {
        import graft.operators.Expectations
        Expectations.fdAudit(Tables.table(s, dir, "documents"), Seq(
          Expectations.Fd(Seq("source"), "lang"),
          Expectations.Fd(Seq("doc_id"), "source"),
          Expectations.Fd(Seq("lang"), "source")))
      },
      Some("""WITH g1 AS (SELECT source, lang, COUNT(*) AS c
                FROM documents GROUP BY 1, 2),
        b1 AS (SELECT SUM(c) AS n, MAX(c) AS keep, COUNT(*) AS nd
               FROM g1 GROUP BY source),
        g2 AS (SELECT doc_id, source, COUNT(*) AS c
               FROM documents GROUP BY 1, 2),
        b2 AS (SELECT SUM(c) AS n, MAX(c) AS keep, COUNT(*) AS nd
               FROM g2 GROUP BY doc_id),
        g3 AS (SELECT lang, source, COUNT(*) AS c
               FROM documents GROUP BY 1, 2),
        b3 AS (SELECT SUM(c) AS n, MAX(c) AS keep, COUNT(*) AS nd
               FROM g3 GROUP BY lang)
        SELECT 'fd(source->lang)' AS fd, COUNT(*) AS n_groups,
          CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS violating_groups,
          CAST(SUM(n) AS BIGINT) AS n_rows,
          CAST((1000000 * SUM(keep)) // SUM(n) AS BIGINT)
            AS confidence_millionths
        FROM b1
        UNION ALL
        SELECT 'fd(doc_id->source)', COUNT(*),
          CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(SUM(n) AS BIGINT),
          CAST((1000000 * SUM(keep)) // SUM(n) AS BIGINT)
        FROM b2
        UNION ALL
        SELECT 'fd(lang->source)', COUNT(*),
          CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(SUM(n) AS BIGINT),
          CAST((1000000 * SUM(keep)) // SUM(n) AS BIGINT)
        FROM b3""")),

    GQ("pr01_provenance", // row-level LINEAGE via the engine's hidden
      // `_metadata` scan columns: every row of the partitioned layout
      // reports the physical file it came from, and the audit rebuilds
      // the per-partition totals FROM THE PATHS ALONE (the layout's
      // o_year column is deliberately dropped — the provenance surface
      // is what answers). At 100 TB this is the incident-response
      // primitive: "which ingest files produced these bad rows" is a
      // group-by on _metadata.file_path, no sidecar bookkeeping, no
      // schema change, zero extra IO (the path is scan metadata the
      // reader already holds). Oracle replays from the unpartitioned
      // originals: lineage must describe the data without changing it.
      (s, dir) => {
        s.read.parquet(ordersByYear(s, dir))
          .select(col("_metadata.file_path").as("src_file"),
            col("o_totalprice"))
          .withColumn("o_year",
            regexp_extract(col("src_file"), "o_year=(\\d+)", 1).cast("int"))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1""")),

    GQ("g02_pagerank", // weighted PageRank over the item browse graph
      // (`operators/Graph.pageRank`) — the iterative-graph family's
      // weighted-flow member beside d18's connected components: edges
      // are per-user item→item transitions (lag over the event stream),
      // rank is flow authority after 6 damped rounds. Everything is
      // INTEGER millionths — per-edge contribution rank·w DIV wout,
      // update 150000 + 850000·Σ DIV 1e6 — because float PageRank sums
      // in partition order and would hash differently at local[8] vs
      // local[32]; the integer recurrence replays bit-for-bit in the
      // oracle's six unrolled CTE rounds. Per round: one |E| join + one
      // map-side-combined aggregate + one |V| left join, rank lineage
      // truncated every round (Components' checkpoint contract) so the
      // plan stays flat at any iteration count.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = ev
          .select(col("item").as("dst"), lag(col("item"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        // 100 items vs 100k+ transitions: the small-vertex-set plan —
        // ranks broadcast, edges never shuffle, one |V|-key agg per round
        graft.operators.Graph.pageRank(edges, iterations = 6,
          smallVertexSet = true)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
            CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
          FROM events),
        tr AS (SELECT item AS dst,
            LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
          FROM ev),
        e0 AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM tr
          WHERE src IS NOT NULL GROUP BY 1, 2),
        wo AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e0 GROUP BY 1),
        e AS (SELECT e0.src, e0.dst, e0.w, wo.wout FROM e0 JOIN wo USING (src)),
        n AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
        p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rk FROM n),
        p1 AS (SELECT n.node, CAST(150000 + (850000 *
            COALESCE(SUM((p.rk * e.w) // e.wout), 0)) // 1000000 AS BIGINT) AS rk
          FROM n LEFT JOIN e ON e.dst = n.node
            LEFT JOIN p0 p ON p.node = e.src GROUP BY n.node),
        p2 AS (SELECT n.node, CAST(150000 + (850000 *
            COALESCE(SUM((p.rk * e.w) // e.wout), 0)) // 1000000 AS BIGINT) AS rk
          FROM n LEFT JOIN e ON e.dst = n.node
            LEFT JOIN p1 p ON p.node = e.src GROUP BY n.node),
        p3 AS (SELECT n.node, CAST(150000 + (850000 *
            COALESCE(SUM((p.rk * e.w) // e.wout), 0)) // 1000000 AS BIGINT) AS rk
          FROM n LEFT JOIN e ON e.dst = n.node
            LEFT JOIN p2 p ON p.node = e.src GROUP BY n.node),
        p4 AS (SELECT n.node, CAST(150000 + (850000 *
            COALESCE(SUM((p.rk * e.w) // e.wout), 0)) // 1000000 AS BIGINT) AS rk
          FROM n LEFT JOIN e ON e.dst = n.node
            LEFT JOIN p3 p ON p.node = e.src GROUP BY n.node),
        p5 AS (SELECT n.node, CAST(150000 + (850000 *
            COALESCE(SUM((p.rk * e.w) // e.wout), 0)) // 1000000 AS BIGINT) AS rk
          FROM n LEFT JOIN e ON e.dst = n.node
            LEFT JOIN p4 p ON p.node = e.src GROUP BY n.node),
        p6 AS (SELECT n.node, CAST(150000 + (850000 *
            COALESCE(SUM((p.rk * e.w) // e.wout), 0)) // 1000000 AS BIGINT) AS rk
          FROM n LEFT JOIN e ON e.dst = n.node
            LEFT JOIN p5 p ON p.node = e.src GROUP BY n.node)
        SELECT node, rk AS rank_millionths FROM p6""")),

    GQ("g03_reachability", // WITH RECURSIVE — the engine's native
      // recursion surface (Spark 4's UnionLoop): min-hop reachability
      // from item 0 over the browse-graph edges. UNION ALL recursion
      // enumerates WALKS — exponential on a dense graph (measured: the
      // depth-3 variant of this query blows Spark's 1M recursion-row
      // limit at sf0.1), and the per-step-dedup form is not yet in the
      // engine (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — tried), so the
      // depth bound of TWO hops is what keeps the walk count
      // ≤ |N(src)|·maxDeg over the DISTINCT-edge table at any corpus
      // size. Unbounded closure at 100 TB belongs to
      // `operators/Graph.reachableFrom`'s deduped-frontier BFS — g07 is
      // that operator over the same graph (this query is the SQL-surface
      // member of that family, not its replacement).
      // The seed derives from the data (src = 0 rows), so a zero-row
      // input recurses zero times; DuckDB replays the identical
      // recursion.
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
          .createOrReplaceTempView("g03_ev")
        s.sql("""WITH RECURSIVE
            tr AS (SELECT item AS dst,
                LAG(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
              FROM g03_ev),
            e AS (SELECT DISTINCT src, dst FROM tr WHERE src IS NOT NULL),
            r(node, hops) AS (
              SELECT DISTINCT src AS node, 0 AS hops FROM e WHERE src = 0
              UNION ALL
              SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node
              WHERE r.hops < 2)
          SELECT node, MIN(hops) AS min_hops FROM r GROUP BY node""")
      },
      Some("""WITH RECURSIVE
          ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
              CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
            FROM events),
          tr AS (SELECT item AS dst,
              LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
            FROM ev),
          e AS (SELECT DISTINCT src, dst FROM tr WHERE src IS NOT NULL),
          r(node, hops) AS (
            SELECT DISTINCT src AS node, 0 AS hops FROM e WHERE src = 0
            UNION ALL
            SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node
            WHERE r.hops < 2)
        SELECT node, MIN(hops) AS min_hops FROM r GROUP BY node""")),

    GQ("g07_frontier_reachability", // deduped-frontier BFS
      // (`operators/Graph.reachableFrom`) — the scale-safe transitive
      // closure g03 documents it cannot be: UNION ALL recursion
      // enumerates WALKS (g03's depth-3 form blows the 1M recursion-row
      // limit at sf0.1 — measured, GraphSpec executes the blow-up), so
      // g03 is capped at two hops; this operator expands a DEDUPED
      // frontier instead — per round one frontier⋈edges join + one
      // left-anti against visited, work proportional to NEW nodes'
      // edges, never to walks — and reaches depth 8 on the same graph
      // at any corpus size (it terminates at the graph's eccentricity;
      // the cap only replays the SQL contract). Level-synchronous
      // expansion makes first-arrival = min-hop, which is exactly what
      // the oracle's deduping UNION recursion computes: DuckDB's
      // recursive UNION dedups (node, hops) pairs against everything
      // produced so far, so its row count is ≤ |V|·depth, not the walk
      // count — the per-step-dedup form Spark's own WITH RECURSIVE
      // rejects (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE, tried in g03).
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = ev
          .select(col("item").as("dst"), lag(col("item"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
        // seed derives from the data (src = 0 rows), so a zero-row input
        // recurses zero times — g03's same contract
        val seeds = edges.filter(col("src") === 0L)
          .select(col("src").as("node"))
        graft.operators.Graph.reachableFrom(edges, seeds, maxDepth = 8)
          .select(col("node"), col("depth").as("min_hops"))
      },
      Some("""WITH RECURSIVE
          ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
              CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
            FROM events),
          tr AS (SELECT item AS dst,
              LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
            FROM ev),
          e AS (SELECT DISTINCT src, dst FROM tr WHERE src IS NOT NULL),
          r(node, hops) AS (
            SELECT DISTINCT src AS node, 0 AS hops FROM e WHERE src = 0
            UNION
            SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node
            WHERE r.hops < 8)
        SELECT node, MIN(hops) AS min_hops FROM r GROUP BY node""")),

    GQ("g09_shortest_paths", // weighted shortest paths from the seed
      // item (`operators/Graph.shortestPaths` — bounded Bellman-Ford,
      // Bellman 1958): the WEIGHTED member of the reachability family —
      // g07 answers "reachable in how many hops", this "at what minimum
      // cost", with cost = 1000000 DIV transition-count so well-travelled
      // links are short (the traffic-weighted item distance a browse
      // graph actually means; the inversion is the caller's contract,
      // stated on the operator). Exactly 6 synchronous relaxations —
      // the result is the exact min cost over paths of ≤ 6 edges, the
      // fixed-K honesty contract of g02/g03, which is also what makes
      // the oracle expressible: six unrolled min-folds, bit-identical
      // integer arithmetic in both engines. Per round one |E| join +
      // one map-side-combined MIN agg + one |reached| full-outer fold;
      // the 100-item vertex set rides as a broadcast (smallVertexSet,
      // g02's hatch) so the edge list never shuffles; lineage truncates
      // every 2 rounds. A fewer-hops-but-costlier path loses to a
      // longer-but-cheaper one — the case hop-count BFS cannot express
      // (GraphSpec pins it on a hand-built graph).
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = ev
          .select(col("item").as("dst"), lag(col("item"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("n"))
          .select(col("src"), col("dst"), expr("1000000 DIV n").as("cost"))
        // seed derives from the data (src = 0 rows) — g03/g07's contract
        val seeds = edges.filter(col("src") === 0L).select(col("src").as("node"))
        graft.operators.Graph.shortestPaths(edges, seeds, wCol = "cost",
          rounds = 6, smallVertexSet = true)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
            CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
          FROM events),
        tr AS (SELECT item AS dst,
            LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
          FROM ev),
        e0 AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM tr
          WHERE src IS NOT NULL GROUP BY 1, 2),
        e AS (SELECT src, dst, CAST(1000000 // n AS BIGINT) AS c FROM e0),
        d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
          FROM e WHERE src = 0),
        d1 AS (SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d0 UNION ALL
            SELECT e.dst, d0.dist + e.c FROM d0 JOIN e ON e.src = d0.node)
          GROUP BY node),
        d2 AS (SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d1 UNION ALL
            SELECT e.dst, d1.dist + e.c FROM d1 JOIN e ON e.src = d1.node)
          GROUP BY node),
        d3 AS (SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d2 UNION ALL
            SELECT e.dst, d2.dist + e.c FROM d2 JOIN e ON e.src = d2.node)
          GROUP BY node),
        d4 AS (SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d3 UNION ALL
            SELECT e.dst, d3.dist + e.c FROM d3 JOIN e ON e.src = d3.node)
          GROUP BY node),
        d5 AS (SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d4 UNION ALL
            SELECT e.dst, d4.dist + e.c FROM d4 JOIN e ON e.src = d4.node)
          GROUP BY node),
        d6 AS (SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d5 UNION ALL
            SELECT e.dst, d5.dist + e.c FROM d5 JOIN e ON e.src = d5.node)
          GROUP BY node)
        SELECT node, CAST(dist AS BIGINT) AS min_cost FROM d6""")),

    GQ("g04_triangles", // exact triangle count by DEGREE ORIENTATION
      // (`operators/Graph.triangleCount` — Suri & Vassilvitskii 2011):
      // community density over the undirected browse graph, the classic
      // "curse of the last reducer" problem. Counting wedges on the raw
      // graph puts deg² work on every hub; orienting each edge from its
      // lower (degree, id) endpoint to the higher makes every triangle
      // exactly one closed 2-path AND bounds every vertex's out-degree
      // by O(√m), so the wedge join is O(m^1.5) total and per-key
      // bounded — a celebrity item spreads its work over its low-degree
      // neighbors instead of stalling one reducer. Three shuffles
      // (degree agg, wedge join, closure join), all-integer counts, so
      // the 1-row verdict replays bit-for-bit; n_wedges rides along as
      // the audit number showing what the closure join had to filter.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = ev
          .select(col("item").as("dst"), lag(col("item"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
        graft.operators.Graph.triangleCount(edges)
      },
      Some("""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
            CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
          FROM events),
        tr AS (SELECT item AS dst,
            LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
          FROM ev),
        und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM tr WHERE src IS NOT NULL AND src <> dst),
        deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM und UNION ALL SELECT b FROM und)
          GROUP BY v),
        o AS (SELECT CASE WHEN db.d < da.d THEN und.b ELSE und.a END AS u,
                CASE WHEN db.d < da.d THEN und.a ELSE und.b END AS w
              FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
        wedges AS (SELECT o1.u, o2.w FROM o o1 JOIN o o2 ON o2.u = o1.w)
        SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
          (SELECT COUNT(*) FROM und) AS n_edges,
          (SELECT COUNT(*) FROM wedges) AS n_wedges,
          (SELECT COUNT(*) FROM wedges wg JOIN o
             ON o.u = wg.u AND o.w = wg.w) AS n_triangles""")),

    GQ("g05_communities", // synchronous weighted LABEL PROPAGATION
      // (`operators/Graph.labelPropagation`, Raghavan et al. 2007) over
      // the item browse graph — the clustering member of the iterative
      // family: d18 answers "connected at all?", this answers "densely
      // connected to WHOM?" (topic pools, negative-sampling strata).
      // The textbook algorithm's random tie-breaks and async updates are
      // engine-hostile; here rounds are synchronous, a node adopts the
      // neighbor label with the largest incident weight sum, ties break
      // to the smallest label, and the round count is fixed — a total
      // order, so the oracle replays all 4 rounds bit-for-bit. Edges
      // symmetrized, self-loops dropped (a self-vote would freeze the
      // label). The graph is kNN-SPARSIFIED first (each item keeps its
      // top-2 outgoing transitions, ties (w DESC, dst ASC)) — the
      // standard LPA preprocessing: on the dense raw browse graph every
      // label floods everywhere and one community swallows the node set
      // (measured: 1 community raw, 52 sparsified at sf0.01); the
      // sparsifier is also what bounds |E| ≤ 2|V| at any corpus size.
      // Per round: one |E| join + one (dst,label) map-side-combined agg
      // + a struct-min argmax (no window, no sort) + one |V| left join;
      // labels broadcast (smallVertexSet), edges never shuffle after the
      // build.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val raw = ev
          .select(col("item").as("dst"), lag(col("item"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          .filter(col("src") =!= col("dst"))
        val topw = Window.partitionBy(col("src"))
          .orderBy(col("w").desc, col("dst"))
        val edges = raw.withColumn("rn", row_number().over(topw))
          .filter(col("rn") <= 2).drop("rn")
        graft.operators.Graph.labelPropagation(edges, iterations = 4,
          smallVertexSet = true)
      },
      Some {
        val rounds = (1 to 4).map { r =>
          s"""c$r AS (SELECT e.dst AS node, p.lbl, CAST(SUM(e.w) AS BIGINT) AS cw
              FROM e JOIN l${r - 1} p ON p.node = e.src GROUP BY 1, 2),
            m$r AS (SELECT node, lbl FROM (
                SELECT node, lbl, ROW_NUMBER() OVER (
                  PARTITION BY node ORDER BY cw DESC, lbl) AS rn FROM c$r)
              WHERE rn = 1),
            l$r AS (SELECT p.node, COALESCE(m.lbl, p.lbl) AS lbl
              FROM l${r - 1} p LEFT JOIN m$r m ON m.node = p.node)"""
        }.mkString(",\n")
        s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
            CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS item
          FROM events),
        tr AS (SELECT item AS dst,
            LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
          FROM ev),
        e0 AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM tr
          WHERE src IS NOT NULL GROUP BY 1, 2),
        top AS (SELECT src, dst, w FROM (
            SELECT src, dst, w, ROW_NUMBER() OVER (
              PARTITION BY src ORDER BY w DESC, dst) AS rn
            FROM e0 WHERE src <> dst)
          WHERE rn <= 2),
        sym AS (SELECT src, dst, w FROM top
          UNION ALL SELECT dst, src, w FROM top),
        e AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM sym
          WHERE src <> dst GROUP BY 1, 2),
        n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        l0 AS (SELECT node, node AS lbl FROM n),
        $rounds
        SELECT node, lbl AS label FROM l4"""
      }),

    GQ("g06_kcore", // k-CORE decomposition by iterative peeling
      // (`operators/Graph.kCore` — Seidman 1983, distributed peel per
      // Montresor et al. 2013): the maximal subgraph where every vertex
      // keeps >= 4 neighbors — the cohesion member of the iterative
      // family (d18 "connected at all?", g05 "clustered with whom?",
      // this "how deeply embedded?" — the dense-nucleus extractor).
      // Graph = g05's kNN-sparsified browse graph (top-3 outgoing
      // transitions per item, ties (w DESC, dst ASC), symmetrized
      // distinct) — on the RAW graph every item has degree ~99 and
      // nothing peels (measured); sparsified, the 4-core peels 9-45% of
      // vertices depending on SF and converges by round 5 at every SF
      // (measured), so the fixed 6 rounds carry a margin and the spec
      // asserts the rounds-vs-rounds+1 fixpoint. Per round one
      // map-side-combined degree agg + two LEFT SEMI joins + a
      // localCheckpoint (g02's lineage trap); the oracle unrolls all 6
      // peels as generated CTEs.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("item"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val raw = ev
          .select(col("item").as("dst"), lag(col("item"), 1).over(w).as("src"))
          .filter(col("src").isNotNull)
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          .filter(col("src") =!= col("dst"))
        val topw = Window.partitionBy(col("src"))
          .orderBy(col("w").desc, col("dst"))
        val knn = raw.withColumn("rn", row_number().over(topw))
          .filter(col("rn") <= 3).select("src", "dst")
        graft.operators.Graph.kCore(knn, k = 4, rounds = 6)
      },
      Some {
        val peels = (0 until 6).map { r =>
          // MATERIALIZED: e(r+1) references e(r) three times (directly and
          // through k(r)); inlined CTEs would re-expand the chain 3^6-fold
          s"""k$r AS MATERIALIZED (SELECT v FROM (SELECT v, COUNT(*) AS d FROM
               (SELECT a AS v FROM e$r UNION ALL SELECT b AS v FROM e$r)
               GROUP BY v) WHERE d >= 4),
          e${r + 1} AS MATERIALIZED (SELECT * FROM e$r
            WHERE a IN (SELECT v FROM k$r)
            AND b IN (SELECT v FROM k$r))"""
        }.mkString(",\n")
        s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
            CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS item
          FROM events),
        tr AS (SELECT item AS dst,
            LAG(item) OVER (PARTITION BY user_id ORDER BY t, event_id) AS src
          FROM ev),
        raw AS (SELECT src, dst, COUNT(*) AS w FROM tr
          WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
        knn AS (SELECT src, dst FROM (SELECT src, dst,
            ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM raw) WHERE rn <= 3),
        e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
            greatest(src, dst) AS b
          FROM knn),
        $peels
        SELECT v AS item, CAST(COUNT(*) AS BIGINT) AS degree FROM
          (SELECT a AS v FROM e6 UNION ALL SELECT b AS v FROM e6) GROUP BY v"""
      }),

    GQ("u04_mor_delete", // MERGE-ON-READ deletes (`operators/MergeOnRead`)
      // — the deferred-rewrite half of the deletion design space beside
      // u02's copy-on-write: the GDPR batch (every 11th 1995 order) is an
      // O(|keys|) append to an underscore-invisible `_deletes` sidecar
      // INSIDE the table — no partition was rewritten — and this query is
      // the READ PATH that subtracts it: plain scan LEFT ANTI one
      // broadcast of the distinct delete keys (Iceberg v2's
      // equality-delete visibility re-expressed on plain directories).
      // At 100 TB this is the right trade for sparse deletes: request
      // cost O(|keys|), read cost one broadcast anti-join, and the
      // physical rewrite happens once in a maintenance window
      // (MergeOnRead.fold → Merge.delete COW → sidecar cleared, spec-
      // asserted ≡ the pre-fold read, incl. the manifest composition).
      // The oracle replays the NOT-matched filter over the originals:
      // sidecar visibility must equal the declarative DELETE.
      (s, dir) => {
        graft.operators.MergeOnRead.read(
            s, morOrders(s, dir), keyCols = Seq("o_orderkey"))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE NOT (year(o_orderdate) = 1995 AND o_orderkey % 11 = 0)
        GROUP BY 1""")),

    GQ("mv02_ivm_join_rollup", // incremental maintenance of a JOIN view
      // (`operators/Ivm`) — the delta-join rule Δ(F ⋈ D) = ΔF ⋈ D that
      // every IVM engine applies: the stored revenue-by-nation view
      // (orders ⋈ customer) absorbs the post-cutoff delta by joining
      // ONLY the delta against the broadcast dimension and merging the
      // delta-aggregate ADDITIVELY (union + one groups-sized re-agg +
      // staged swap). mv01's sibling one step up: mv01 recomputes a
      // single-table rollup's touched groups (replace semantics);
      // this one never recomputes anything — append-only facts make
      // pure addition correct, and DECIMAL sums keep it exact in any
      // merge order. At 100 TB maintenance costs O(|Δ| ⋈ dims), and the
      // oracle is the invariant that earns the stored view its trust:
      // incremental must be indistinguishable from the from-scratch
      // recompute over the raw originals.
      (s, dir) => {
        s.read.parquet(joinViewOrders(s, dir))
          .select(col("c_nationkey"), col("n_orders"),
            col("revenue").cast("double").as("revenue"))
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1""")),

    GQ("cdc01_change_feed", // CHANGE DATA FEED between published
      // snapshots (`Snapshot.changeFeed`) — the PRODUCER side of the CDC
      // story whose consumer is the streaming mergeUpsertSink: v1→v2 of
      // the versioned 1996 slice emits the actual row-level changes in
      // Delta-CDF shape — insert/delete rows with the one-sided payload,
      // changed ids as an update_pre + update_post PAIR so a consumer
      // can retract-then-apply without re-reading either snapshot
      // (diff's per-id status, upgraded to applicable rows). One
      // full-outer join on the id, both sides reduced to (id, payload
      // struct) at the scan, unchanged ids filtered BEFORE the 2×
      // update fan-out; bucket both snapshots on the id for the
      // recurring exchange-free form. All four op classes non-vacuous
      // by construction (bump %7 / delete %13 / insert %17); the oracle
      // rebuilds both versions from the originals and classifies with
      // joins — the committed feed must equal the declarative diff.
      (s, dir) => {
        val root = cdcOrders(s, dir)
        graft.operators.Snapshot.changeFeed(
          graft.operators.Snapshot.readVersion(s, root, Some(1)),
          graft.operators.Snapshot.readVersion(s, root, Some(2)),
          idCol = "o_orderkey", payloadCols = Seq("o_totalprice"))
      },
      Some("""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
            WHERE year(o_orderdate) = 1996),
        bumped AS (SELECT k, CASE WHEN k % 7 = 0 THEN p + 1000.0 ELSE p END AS p
                   FROM v1),
        v2 AS (SELECT k, p FROM bumped WHERE k % 13 <> 0
               UNION ALL
               SELECT k + 1000000000, p FROM v1 WHERE k % 17 = 0)
        SELECT 'delete' AS op, k AS o_orderkey, p AS o_totalprice
          FROM v1 WHERE k % 13 = 0
        UNION ALL
        SELECT 'insert', k, p FROM v2 WHERE k > 1000000000
        UNION ALL
        SELECT 'update_pre', v1.k, v1.p FROM v1 JOIN v2 USING (k)
          WHERE v1.p <> v2.p
        UNION ALL
        SELECT 'update_post', v1.k, v2.p FROM v1 JOIN v2 USING (k)
          WHERE v1.p <> v2.p""")),

    GQ("pp04_partition_evolution", // PARTITION-SPEC EVOLUTION — the
      // fourth scan lever's schema-change twin: generation 1 (≤1995) was
      // laid out by o_year alone, generation 2 (≥1996) adopted the finer
      // (o_year, o_month) spec, and NOTHING was rewritten at the spec
      // change (at 100 TB a history repartition is a full-table copy —
      // the evolution Iceberg's partition-spec versioning exists to
      // avoid). The reader composes the generations with PER-GENERATION
      // predicate translation: the month predicate hits g2 as a
      // partition filter (directories pruned from the listing) and g1 as
      // the equivalent row filter on o_orderdate (files scanned, rows
      // filtered) — each generation pays exactly what its layout can
      // prove. The oracle replays the month filter over the unpartitioned
      // originals: evolution must never change answers.
      (s, dir) => {
        val root = partEvolvedOrders(s, dir)
        val common = Seq("o_year", "o_orderkey", "o_totalprice")
        val g1 = s.read.parquet(s"$root/g1")
          .filter(month(col("o_orderdate")) === 3)
          .select(common.map(col): _*)
        val g2 = s.read.parquet(s"$root/g2")
          .filter(col("o_month") === 3)
          .select(common.map(col): _*)
        g1.unionByName(g2)
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders WHERE month(o_orderdate) = 3 GROUP BY 1""")),

    GQ("x26_categorical_drift", // total-variation drift per period
      // (`Drift.categoricalDrift`) — the drift family's CATEGORICAL axis
      // beside x19's online quantile gate and x11's offline KS: for each
      // year, TVD = ½ Σ_cat |o/No − r/Nr| against the 1995 reference
      // distribution of order priorities — "what fraction of probability
      // mass moved", the right metric where quantiles are meaningless.
      // EXACT integer arithmetic end to end (per-category |o·Nr − r·No|
      // in longs, final floor(1e6·S/(2·No·Nr)) in DECIMAL(38,0) integral
      // division — no χ² float division, no G-test libm log), so the
      // verdict hash-compares bit-for-bit. The 1995-vs-itself row is the
      // built-in zero: TVD = 0 by identity, proving the metric's floor.
      // Shape: two map-side-combined groupBys + a |years|×|categories|
      // grid — at 100 TB the reference (cat, count) table is a stored
      // KB artifact and each batch scores against it in its own scan.
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
        graft.operators.Drift.categoricalDrift(
          ref = o.filter(col("o_year") === 1995),
          cur = o,
          catCol = "o_orderpriority", groupCol = "o_year")
      },
      Some("""WITH o AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
            o_orderpriority AS cat FROM orders),
        ref AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS r FROM o
          WHERE y = 1995 GROUP BY 1),
        rt AS (SELECT CAST(SUM(r) AS BIGINT) AS nr FROM ref),
        cur AS (SELECT y, cat, CAST(COUNT(*) AS BIGINT) AS oc FROM o GROUP BY 1, 2),
        ct AS (SELECT y, CAST(SUM(oc) AS BIGINT) AS no FROM cur GROUP BY 1),
        grid AS (SELECT ct.y, ref.cat, ref.r FROM ct CROSS JOIN ref),
        ap AS (SELECT COALESCE(g.y, c.y) AS y, COALESCE(g.cat, c.cat) AS cat,
                 COALESCE(g.r, 0) AS r, COALESCE(c.oc, 0) AS oc
               FROM grid g FULL OUTER JOIN cur c ON g.y = c.y AND g.cat = c.cat),
        s AS (SELECT ap.y, ct.no, rt.nr,
                CAST(SUM(abs(oc * rt.nr - r * ct.no)) AS BIGINT) AS sd
              FROM ap JOIN ct ON ct.y = ap.y CROSS JOIN rt
              GROUP BY ap.y, ct.no, rt.nr)
        SELECT y AS o_year, no AS n_current,
          CAST((CAST(1000000 AS HUGEINT) * sd)
            // (2 * CAST(no AS HUGEINT) * nr) AS BIGINT) AS tvd_millionths,
          CAST((CAST(1000000 AS HUGEINT) * sd)
            // (2 * CAST(no AS HUGEINT) * nr) AS BIGINT) >= 20000 AS drifted
        FROM s WHERE nr > 0 AND no > 0""")),

    GQ("u05_scd2", // SCD Type-2 dimension maintenance (`operators/Scd`):
      // change batches CLOSE the matched version (scd_valid_to stamped)
      // and open a new one instead of overwriting — the Kimball pattern
      // every warehouse dimension load runs, here as a COW commit whose
      // layout (open slice in scd_part=cur, closings in append-only
      // scd_part=v) makes an apply cost |current|+|closed@v|, never
      // |history|. The audit groups the FULL committed history by
      // validity span; the oracle rebuilds the same history declaratively
      // from the originals (v2 = +100 on every 3rd key + CLONE inserts,
      // v3 = +50 compounded on every 6th current key), so version
      // stamping, close/open pairing, insert handling, and the
      // no-rewrite layout must all agree bit-for-bit.
      (s, dir) => {
        Scd.history(s, scdCustomers(s, dir))
          .groupBy("scd_valid_from", "scd_valid_to")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("c_custkey")).as("n_keys"),
            Dec.dsum(col("c_acctbal")).as("sum_bal"))
      },
      Some("""WITH b2u AS (SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
                FROM customer WHERE c_custkey % 3 = 0),
        b2i AS (SELECT c_custkey + 10000000 AS c_custkey, c_acctbal
                FROM customer WHERE c_custkey % 97 = 0),
        s2 AS (SELECT c_custkey, c_acctbal, 1 AS vf FROM customer
                 WHERE c_custkey % 3 <> 0
               UNION ALL SELECT c_custkey, c_acctbal, 2 FROM b2u
               UNION ALL SELECT c_custkey, c_acctbal, 2 FROM b2i),
        closed2 AS (SELECT c_custkey, c_acctbal, 1 AS vf, 2 AS vt
                    FROM customer WHERE c_custkey % 3 = 0),
        closed3 AS (SELECT c_custkey, c_acctbal, vf, 3 AS vt FROM s2
                    WHERE c_custkey % 6 = 0),
        s3 AS (SELECT c_custkey, c_acctbal, vf, CAST(NULL AS INTEGER) AS vt
                 FROM s2 WHERE c_custkey % 6 <> 0
               UNION ALL SELECT c_custkey, c_acctbal + 50.0, 3, NULL
                 FROM s2 WHERE c_custkey % 6 = 0),
        hist AS (SELECT * FROM closed2 UNION ALL SELECT * FROM closed3
                 UNION ALL SELECT * FROM s3)
        SELECT CAST(vf AS BIGINT) AS scd_valid_from,
          CAST(vt AS BIGINT) AS scd_valid_to,
          COUNT(*) AS n_rows,
          CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM hist GROUP BY 1, 2""")),

    GQ("fs01_pit_join", // point-in-time-correct feature join over the SCD2
      // history: each order is enriched with the customer attributes AS
      // THEY WERE at order time (order years mapped to dim versions
      // 1/2/3) — the feature-store discipline that prevents temporal
      // leakage, where training joins against today's dimension and
      // learns from the future. Because SCD2 validity intervals PARTITION
      // each key's timeline, "the version valid at t" is exactly "the
      // latest valid_from <= t" — so the lookup runs as the as-of join
      // (one shuffle + window, no non-equi range join, a01's machinery)
      // while the oracle states the same thing declaratively with the
      // interval predicate. Facts joining versioned dims this way never
      // rescan history: cost is one |facts|+|history| shuffle.
      (s, dir) => {
        val hist = Scd.history(s, scdCustomers(s, dir))
          .select("c_custkey", "scd_valid_from", "c_acctbal")
        val facts = t(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          when(year(col("o_orderdate")) <= 1995, 1L)
            .when(year(col("o_orderdate")) === 1996, 2L)
            .otherwise(3L).as("fact_v"))
        AsOfJoin.asofJoin(facts, hist,
          leftKey = "o_custkey", rightKey = "c_custkey",
          leftTime = "fact_v", rightTime = "scd_valid_from",
          payload = Seq("scd_valid_from", "c_acctbal"),
          rightTiebreak = "c_custkey")
          .groupBy(col("fact_v"), col("asof_scd_valid_from").as("dim_v"))
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"),
            Dec.dsum(col("asof_c_acctbal")).as("bal_sum"))
      },
      Some("""WITH b2u AS (SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
                FROM customer WHERE c_custkey % 3 = 0),
        b2i AS (SELECT c_custkey + 10000000 AS c_custkey, c_acctbal
                FROM customer WHERE c_custkey % 97 = 0),
        s2 AS (SELECT c_custkey, c_acctbal, 1 AS vf FROM customer
                 WHERE c_custkey % 3 <> 0
               UNION ALL SELECT c_custkey, c_acctbal, 2 FROM b2u
               UNION ALL SELECT c_custkey, c_acctbal, 2 FROM b2i),
        closed2 AS (SELECT c_custkey, c_acctbal, 1 AS vf, 2 AS vt
                    FROM customer WHERE c_custkey % 3 = 0),
        closed3 AS (SELECT c_custkey, c_acctbal, vf, 3 AS vt FROM s2
                    WHERE c_custkey % 6 = 0),
        s3 AS (SELECT c_custkey, c_acctbal, vf, CAST(NULL AS INTEGER) AS vt
                 FROM s2 WHERE c_custkey % 6 <> 0
               UNION ALL SELECT c_custkey, c_acctbal + 50.0, 3, NULL
                 FROM s2 WHERE c_custkey % 6 = 0),
        hist AS (SELECT * FROM closed2 UNION ALL SELECT * FROM closed3
                 UNION ALL SELECT * FROM s3),
        facts AS (SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(CASE WHEN year(o_orderdate) <= 1995 THEN 1
                    WHEN year(o_orderdate) = 1996 THEN 2
                    ELSE 3 END AS BIGINT) AS fact_v FROM orders)
        SELECT f.fact_v, CAST(h.vf AS BIGINT) AS dim_v,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          CAST(SUM(CAST(h.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        FROM facts f JOIN hist h ON f.o_custkey = h.c_custkey
          AND h.vf <= f.fact_v AND (h.vt IS NULL OR h.vt > f.fact_v)
        GROUP BY 1, 2""")),

    GQ("u03_time_travel", // versioned snapshots — poor-man's TIME TRAVEL
      // (`Snapshot.publish/readVersion`): each release is an immutable
      // v=K directory (staged + renamed, never observed half-written);
      // the live-table mutators (u01 Merge, c02 Compaction) answer
      // "what is the table", this answers "what WAS it" — the
      // which-corpus-trained-this-model reproducibility question. The
      // audit here reads the ROOT hive-style: every version in one scan,
      // `v` behaving as a partition column. Oracle replays both frozen
      // states from the originals: published history must never drift.
      (s, dir) => {
        s.read.parquet(versionedOrders(s, dir))
          .groupBy("v")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""WITH y96 AS (SELECT o_orderkey, o_totalprice FROM orders
            WHERE year(o_orderdate) = 1996)
        SELECT 1 AS v, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM y96
        UNION ALL
        SELECT 2, COUNT(*),
          CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
            THEN o_totalprice + 1000.0 ELSE o_totalprice END
            AS DECIMAL(18,2))) AS DOUBLE)
        FROM y96""")),

    GQ("c02_compact_layout", // small-file compaction — the OPTIMIZE /
      // bin-packing maintenance job (`operators/Compaction`): a
      // fragmented per-micro-batch layout (≤12 files per year dir) is
      // rewritten to one ~target-sized file per directory; healthy
      // partitions are not read, not rewritten, not footer-opened
      // (CompactionSpec asserts untouched mtimes). At 100 TB the
      // per-file costs — listing, footers, task scheduling — are the
      // scan bottleneck a thousand-file day creates; compaction is how
      // the layout stays scannable under continuous ingest. The oracle
      // replays the aggregate over the never-compacted originals:
      // compaction moves rows between files, never changes them.
      (s, dir) => {
        s.read.parquet(compactedOrders(s, dir))
          .groupBy("o_year")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1""")),

    GQ("c03_zorder_compact", // OPTIMIZE-ZORDER compaction — c02's bin
      // packing and z01's clustering in ONE rewrite (`Compaction.compact`
      // with zorderBy): per-micro-batch ingest destroys both file counts
      // and clustering, and fixing them in separate passes would read and
      // write the fragmented data twice; here the rewritten rows sort by
      // their Morton interleave and split into equal-depth z-ranges per
      // directory, so the compacted files come back with tight
      // (o_custkey, o_orderkey) min/max boxes (locality spec-asserted in
      // CompactionSpec). Healthy directories still never open. The
      // selective custkey-range aggregate below is the read shape the
      // restored clustering serves; the oracle replays it over the
      // never-compacted originals — maintenance must move rows, never
      // change them.
      (s, dir) => {
        s.read.parquet(zCompactedOrders(s, dir))
          .filter(col("o_custkey").between(100, 999))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            Dec.dsum(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders WHERE o_custkey BETWEEN 100 AND 999
        GROUP BY 1""")),

    GQ("i01_item_cooccurrence", // "viewed X also viewed Y" — item-item
      // co-occurrence LIFT from the event stream, the collaborative-
      // filtering prep g02's transition graph is the sequential cousin
      // of (co-occurrence is order-free set membership; the browse graph
      // is ordered adjacency). Pair generation follows the engine's
      // pair-finder discipline on a NEW domain: per-user DISTINCT item
      // sets, users above the 80-item cap dropped BEFORE pairing (a
      // bot/crawler user fans |items|²/2 pairs — the same density bound
      // as d44's fingerprint doc-freq cap), and pairs stream from the
      // lazy ordered_pairs_gen generator (never a materialized n²
      // array). Denominators count the SAME capped universe the pairs
      // come from — mixing universes silently biases lift. Integer lift
      // millionths = cab·n_users·1e6 DIV (ca·cb), x21's no-log
      // discipline; two key-bounded shuffles (user, pair) at any scale.
      (s, dir) => {
        val ui = Tables.events(s, dir)
          .select(col("user_id"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("k"))
          .distinct()
        val kept = ui.groupBy("user_id")
          .agg(sort_array(collect_set(col("k"))).as("items"))
          .filter(size(col("items")) <= 80)
          .persist() // three consumers: pairs, item counts, user count
        val cab = kept
          .select(graft.expressions.OrderedPairsGen(col("items")))
          .groupBy(col("a").as("ia"), col("b").as("ib"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 5)
        val cnt = kept.select(explode(col("items")).as("k"))
          .groupBy("k").agg(count(lit(1)).as("cu"))
        val nu = kept.agg(count(lit(1)).as("nu"))
        cab
          .join(cnt.select(col("k").as("ia"), col("cu").as("ca")), "ia")
          .join(cnt.select(col("k").as("ib"), col("cu").as("cb")), "ib")
          .crossJoin(broadcast(nu))
          .select(col("ia"), col("ib"), col("cab"),
            expr("(cab * nu * 1000000) DIV (ca * cb)").as("lift_millionths"))
          .orderBy(col("lift_millionths").desc, col("ia"), col("ib"))
          .limit(100)
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id,
            CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
          FROM events),
        sets AS (SELECT user_id, COUNT(*) AS ni FROM ev
          GROUP BY 1 HAVING COUNT(*) <= 80),
        kept AS (SELECT ev.user_id, ev.k FROM ev JOIN sets USING (user_id)),
        cab AS (SELECT a.k AS ia, b.k AS ib, CAST(COUNT(*) AS BIGINT) AS cab
          FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.k < b.k
          GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        cnt AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS cu FROM kept GROUP BY 1),
        nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM sets)
        SELECT cab.ia, cab.ib, cab.cab,
          CAST((cab.cab * nu.nu * 1000000) // (ca.cu * cb.cu) AS BIGINT)
            AS lift_millionths
        FROM cab CROSS JOIN nu
          JOIN cnt ca ON ca.k = cab.ia
          JOIN cnt cb ON cb.k = cab.ib
        ORDER BY lift_millionths DESC, ia, ib LIMIT 100""")),

    GQ("x12_mad_outliers", // robust per-group outlier stats: median and
      // MAD (median absolute deviation) of token counts per language,
      // plus the count past the 3-MAD fence. All integer arithmetic —
      // percentile_disc picks an actual data value, deviations are |int −
      // int| — so the whole decision replays bit-for-bit, unlike
      // stddev-based fences (float accumulation order). Three tiny
      // aggregates broadcast back onto the scan; the corpus shuffles once
      // per aggregation level, never for the fence test.
      (s, dir) => {
        Tables.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), tokenCount(col("text")).as("nt"))
          .createOrReplaceTempView("doc_tokens")
        s.sql("""
          WITH med AS (SELECT lang,
                 CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY nt) AS BIGINT) AS med
               FROM doc_tokens GROUP BY lang),
          dev AS (SELECT t.lang, t.nt, m.med, abs(t.nt - m.med) AS adev
                  FROM doc_tokens t JOIN med m ON t.lang = m.lang),
          mad AS (SELECT lang,
                 CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT) AS mad
               FROM dev GROUP BY lang)
          SELECT d.lang, MAX(d.med) AS med, MAX(a.mad) AS mad,
            COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
              AS n_outliers
          FROM dev d JOIN mad a ON d.lang = a.lang
          GROUP BY d.lang""")
      },
      Some("""WITH doc_tokens AS (SELECT doc_id, lang,
            CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS nt
          FROM documents),
        med AS (SELECT lang,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY nt) AS BIGINT) AS med
             FROM doc_tokens GROUP BY lang),
        dev AS (SELECT t.lang, t.nt, m.med, abs(t.nt - m.med) AS adev
                FROM doc_tokens t JOIN med m ON t.lang = m.lang),
        mad AS (SELECT lang,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS BIGINT) AS mad
             FROM dev GROUP BY lang)
        SELECT d.lang, MAX(d.med) AS med, MAX(a.mad) AS mad,
          COUNT(*) AS n_docs,
          CAST(SUM(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
            AS n_outliers
        FROM dev d JOIN mad a ON d.lang = a.lang
        GROUP BY d.lang""")),

    GQ("x13_burst_dedup", // time-windowed event dedup: within each user's
      // stream, a burst is a run of events less than 6 h apart; only the
      // burst HEAD survives (the batch analog of streaming
      // dropDuplicatesWithinWatermark: suppress repeats inside the window,
      // let genuine re-occurrences through). Gaps-and-islands lag test on
      // exact epoch micros — deterministic, non-vacuous in both directions
      // (~43% of events are suppressed at both SFs). One shuffle on
      // user_id; the same hot-key bucketing hatch as the as-of join
      // applies when one user dominates a real stream.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(w)))
          .filter(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 6L * 3600L * 1000000L)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsm FROM events),
        m AS (SELECT event_id, user_id, epoch_us(tsm) AS us,
                LAG(epoch_us(tsm), 1) OVER (PARTITION BY user_id
                  ORDER BY tsm, event_id) AS prev_us
              FROM e)
        SELECT event_id, user_id, us AS ts_us FROM m
        WHERE prev_us IS NULL OR us - prev_us > CAST(21600000000 AS BIGINT)""")),

    GQ("h01_approx_distinct", // HLL sketch, oracle-checked via error-bound property
      // The HLL estimate itself isn't DuckDB-replayable, but it is
      // deterministic given the data, so the oracle checks the exact half
      // plus the property |approx - exact| / exact <= 3 * rsd (rsd = 0.05
      // default). The sketch still runs; a broken HLL flips approx_ok.
      (s, dir) =>
        t(s, dir, "lineitem").groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey")).as("approx"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx") - col("exact_parts")).cast("double")
              / col("exact_parts") <= 0.15).as("approx_ok")),
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS approx_ok
        FROM lineitem GROUP BY l_returnflag""")),

    GQ("x06_approx_quantiles", // Greenwald-Khanna sketch quantiles,
      // h01-style error-bound oracle: with accuracy=100 the rank error is
      // ≤ 1/100, so each approx quantile must land between the EXACT
      // discrete quantiles at q∓0.02 — checked per group; the exact
      // percentile_disc values (engine-replayable, no interpolation) are
      // the hash-compared payload and a broken sketch flips approx_ok.
      // The sketch is the 100 TB path: one pass, mergeable partials,
      // no per-group sort.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""WITH s AS (SELECT l_returnflag,
            approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), 100) AS ap,
            percentile_disc(0.23) WITHIN GROUP (ORDER BY l_extendedprice) AS lo1,
            percentile_disc(0.27) WITHIN GROUP (ORDER BY l_extendedprice) AS hi1,
            percentile_disc(0.48) WITHIN GROUP (ORDER BY l_extendedprice) AS lo2,
            percentile_disc(0.52) WITHIN GROUP (ORDER BY l_extendedprice) AS hi2,
            percentile_disc(0.73) WITHIN GROUP (ORDER BY l_extendedprice) AS lo3,
            percentile_disc(0.77) WITHIN GROUP (ORDER BY l_extendedprice) AS hi3,
            percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
            percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
            percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75
          FROM lineitem GROUP BY l_returnflag)
          SELECT l_returnflag, p25, p50, p75,
            (ap[0] >= lo1 AND ap[0] <= hi1 AND
             ap[1] >= lo2 AND ap[1] <= hi2 AND
             ap[2] >= lo3 AND ap[2] <= hi3) AS approx_ok
          FROM s""")
      },
      Some("""SELECT l_returnflag,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
        percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
        TRUE AS approx_ok
        FROM lineitem GROUP BY l_returnflag""")),

    GQ("x07_bloom_prune", // bloom-filter runtime pruning (the semi-join
      // pushdown InjectRuntimeFilter plants), property oracle: n_build and
      // n_exact are exact (hash-compared); no_false_negatives must come out
      // TRUE by construction — a broken bloom build/probe flips it; and
      // fp_bounded asserts the pruned pass-through stays within the sized
      // false-positive budget (2% of probe rows — generous vs the 1% the
      // filter was sized for, robust to hash-family jitter across versions).
      // The bloom auto-sizes from the build cardinality, so the property
      // holds at EVERY sf (a fixed 10k guess failed fp_bounded at sf0.1,
      // where the build side is 30k keys).
      (s, dir) => {
        val bld = t(s, dir, "orders")
          .filter(col("o_totalprice") > 400000).select("o_orderkey")
        val probe = t(s, dir, "lineitem").select("l_orderkey")
        val pruned = graft.operators.RuntimeFilter.bloomPrune(
          probe, "l_orderkey", bld, "o_orderkey", fpp = 0.01)
        val exact = probe.join(bld,
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        val missed = exact.distinct()
          .exceptAll(pruned.distinct())
          .agg(count(lit(1)).as("n_missed"))
        bld.agg(count(lit(1)).as("n_build"))
          .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
          .crossJoin(pruned.agg(count(lit(1)).as("n_pass")))
          .crossJoin(probe.agg(count(lit(1)).as("n_probe")))
          .crossJoin(missed)
          .select(col("n_build"), col("n_exact"),
            (col("n_missed") === 0).as("no_false_negatives"),
            (col("n_pass") - col("n_exact") <=
              col("n_probe").cast("double") * 0.02).as("fp_bounded"))
      },
      Some("""SELECT
        (SELECT COUNT(*) FROM orders WHERE o_totalprice > 400000) AS n_build,
        (SELECT COUNT(*) FROM lineitem l WHERE EXISTS
          (SELECT 1 FROM orders o
           WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000))
          AS n_exact,
        TRUE AS no_false_negatives, TRUE AS fp_bounded""")),

    GQ("x08_funnel", // ordered event-sequence (funnel) analysis: per user,
      // earliest view -> first click after it -> first purchase after that,
      // all inside 24h of the view. Every step is a min() under a condition
      // derived from the previous step, so the result is deterministic (no
      // arbitrary row picks). Scale shape: three aggregates + two joins all
      // keyed on user_id — after the first exchange the rest reuse the
      // partitioning; nothing shuffles the event table twice.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts").as("t"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("t")).as("t1"))
        val c = e.join(v, "user_id")
          .filter(col("event_type") === "click" && col("t") > col("t1")
            && col("t") <= col("t1") + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id").agg(min(col("t")).as("t2"))
        val p = e.join(v, "user_id").join(c, "user_id")
          .filter(col("event_type") === "purchase" && col("t") > col("t2")
            && col("t") <= col("t1") + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id").agg(min(col("t")).as("t3"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3)
              .when(col("t2").isNotNull, 2).otherwise(1).as("step"),
            col("t1"), col("t2"), col("t3"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
              FROM events),
        v AS (SELECT user_id, MIN(t) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(t) AS t2 FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND t > v.t1
                AND t <= v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(t) AS t3
              FROM e JOIN v USING (user_id) JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND t > c.t2
                AND t <= v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id)
        SELECT v.user_id,
          CASE WHEN p.user_id IS NOT NULL THEN 3
               WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS step,
          v.t1, c.t2, p.t3
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id""")),

    GQ("x09_retention_cohort", // cohort retention: users grouped by
      // first-seen day; distinct actives per (cohort, day offset). The
      // first-seen table is one aggregate on user_id, broadcast-joinable
      // back onto the event scan; the retention matrix is a second
      // aggregate. Integer day offsets — no float drift.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
        val f = e.groupBy("user_id").agg(min(col("d")).as("cohort"))
        e.join(f, "user_id")
          .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
      },
      Some("""WITH e AS (SELECT user_id,
            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
            FROM events),
        f AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY user_id)
        SELECT f.cohort,
          CAST(datediff('day', f.cohort, e.d) AS INTEGER) AS day_offset,
          COUNT(DISTINCT e.user_id) AS n_active
        FROM e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2""")),

    GQ("x10_sketch_rollup", // mergeable-sketch pre-aggregation: per-day
      // DataSketches HLL sketches of user_id built once (the stored
      // "sketch table" pattern), then UNIONED to the 30-day unique count
      // WITHOUT rescanning events — at 100 TB this is how distinct-count
      // rollups avoid re-reading history: daily sketch partitions are a
      // few KB each and union in milliseconds. h01-style property oracle:
      // exact per-day distincts are hash-compared; the merged estimate
      // must land within 5% of the exact total (a broken merge path
      // collapses it to a single day's cardinality and flips the bool).
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        val daily = e.groupBy("day")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"),
            countDistinct(col("user_id")).as("exact_users"))
        val merged = daily.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        val exactTot = e.agg(countDistinct(col("user_id")).as("exact_total"))
        daily.select(col("day"), col("exact_users"))
          .crossJoin(broadcast(merged)).crossJoin(broadcast(exactTot))
          .select(col("day"), col("exact_users"), col("exact_total"),
            (abs(col("est") - col("exact_total")).cast("double")
              / col("exact_total") <= 0.05).as("merged_ok"))
      },
      Some("""WITH e AS (SELECT
            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
            user_id FROM events),
        d AS (SELECT day, COUNT(DISTINCT user_id) AS exact_users
              FROM e GROUP BY day),
        t AS (SELECT COUNT(DISTINCT user_id) AS exact_total FROM e)
        SELECT day, exact_users, exact_total, TRUE AS merged_ok
        FROM d CROSS JOIN t""")),

    GQ("x22_audience_overlap", // HLL SET ALGEBRA — audience overlap by
      // inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where
      // A/B are the 1995/1996 repeat-customer sets and the union rides
      // hll_union over the two stored-able sketches. This is the
      // distinct-count question sketches cannot answer directly (HLL has
      // no native intersect — register-wise min is NOT an intersection),
      // and the IE identity is the standard workaround, with error
      // compounding from all three estimates — which is why the output
      // carries exact counts as the hash-compared payload and the
      // estimates only as property flags (x10's discipline): union
      // within 5%, IE intersection within 15% of exact. At 100 TB the
      // exact branch disappears and the per-segment sketches are stored
      // KB artifacts — cross-segment overlap matrices then cost
      // |segments|² sketch merges, never a rescan.
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(year(col("o_orderdate")).as("y"), col("o_custkey"))
          .filter(col("y").isin(1995, 1996))
        val sk = o.filter(col("y") === 1995)
          .agg(expr("hll_sketch_agg(o_custkey)").as("ska"),
            countDistinct(col("o_custkey")).as("exact_a"))
          .crossJoin(o.filter(col("y") === 1996)
            .agg(expr("hll_sketch_agg(o_custkey)").as("skb"),
              countDistinct(col("o_custkey")).as("exact_b")))
        val exact = o.groupBy("o_custkey")
          .agg(max(when(col("y") === 1995, 1L).otherwise(0L)).as("ia"),
            max(when(col("y") === 1996, 1L).otherwise(0L)).as("ib"))
          .agg(coalesce(sum(col("ia") * col("ib")), lit(0L)).as("exact_both"),
            count(lit(1)).as("exact_union"))
        sk.crossJoin(exact)
          .select(col("exact_a"), col("exact_b"), col("exact_both"),
            col("exact_union"),
            expr("hll_sketch_estimate(ska)").as("est_a"),
            expr("hll_sketch_estimate(skb)").as("est_b"),
            expr("hll_sketch_estimate(hll_union(ska, skb))").as("est_u"))
          .select(col("exact_a"), col("exact_b"), col("exact_both"),
            col("exact_union"),
            coalesce(abs(col("est_u") - col("exact_union")).cast("double")
              / greatest(col("exact_union"), lit(1L)) <= 0.05, lit(true))
              .as("union_ok"),
            coalesce(abs(col("est_a") + col("est_b") - col("est_u")
              - col("exact_both")).cast("double")
              / greatest(col("exact_both"), lit(1L)) <= 0.15, lit(true))
              .as("ie_ok"))
      },
      Some("""WITH o AS (SELECT year(o_orderdate) AS y, o_custkey FROM orders
            WHERE year(o_orderdate) IN (1995, 1996)),
        f AS (SELECT o_custkey,
            MAX(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS ia,
            MAX(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS ib
          FROM o GROUP BY 1)
        SELECT
          (SELECT COUNT(DISTINCT o_custkey) FROM o WHERE y = 1995) AS exact_a,
          (SELECT COUNT(DISTINCT o_custkey) FROM o WHERE y = 1996) AS exact_b,
          CAST(COALESCE(SUM(ia * ib), 0) AS BIGINT) AS exact_both,
          COUNT(*) AS exact_union,
          TRUE AS union_ok, TRUE AS ie_ok
        FROM f""")),

    GQ("x17_quantile_rollup", // mergeable QUANTILE-sketch pre-aggregation —
      // x10's stored-sketch rollup pattern for percentiles: per-day GK
      // summaries of the event value (qsketch_agg, a few KB each) are the
      // stored artifact; the 30-day p50/p95 comes from qsketch_merge_agg
      // over the SKETCH ROWS — history is never rescanned. At 100 TB the
      // exact side below disappears (it exists only to power the property
      // oracle) and the rollup touches |days| sketch rows, not events.
      // h01-style property oracle: per-day exact counts are hash-compared;
      // the merged estimates must land between exact percentile_disc rank
      // bounds at p ∓ 4·eps (eps = 0.01 per sketch; GK merge degrades the
      // bound by at most an additive eps, so 4× is comfortable slack).
      // Raw estimates are partitioning-dependent (GK merge order) and are
      // deliberately NOT in the output — only the exact payload and the
      // property flags, which hold at any executor count.
      (s, dir) => {
        import graft.expressions.QSketch
        val e = Tables.events(s, dir)
          .select(date_trunc("day", col("ts")).as("day"), col("value"))
        val daily = e.groupBy("day").agg(
          QSketch.sketchAgg(col("value"), 0.01).as("sk"),
          count(col("value")).as("n_vals"))
        val merged = daily.agg(QSketch.mergeAgg(col("sk")).as("msk"))
          .select(QSketch.query(col("msk"), 0.5).as("p50_est"),
            QSketch.query(col("msk"), 0.95).as("p95_est"))
        e.createOrReplaceTempView("x17_ev")
        val bounds = s.sql("""SELECT
            percentile_disc(0.46) WITHIN GROUP (ORDER BY value) AS lo50,
            percentile_disc(0.54) WITHIN GROUP (ORDER BY value) AS hi50,
            percentile_disc(0.91) WITHIN GROUP (ORDER BY value) AS lo95,
            percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS hi95,
            percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50_exact,
            percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95_exact
          FROM x17_ev WHERE value IS NOT NULL""")
        daily.select(col("day"), col("n_vals"))
          .crossJoin(broadcast(merged)).crossJoin(broadcast(bounds))
          .select(col("day"), col("n_vals"), col("p50_exact"), col("p95_exact"),
            (col("p50_est") >= col("lo50") && col("p50_est") <= col("hi50")).as("p50_ok"),
            (col("p95_est") >= col("lo95") && col("p95_est") <= col("hi95")).as("p95_ok"))
      },
      Some("""WITH e AS (SELECT
            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
            value FROM events),
        d AS (SELECT day, COUNT(value) AS n_vals FROM e GROUP BY day),
        b AS (SELECT
            percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50_exact,
            percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95_exact
          FROM e WHERE value IS NOT NULL)
        SELECT day, n_vals, p50_exact, p95_exact,
          TRUE AS p50_ok, TRUE AS p95_ok
        FROM d CROSS JOIN b""")),

    GQ("x19_drift_gate", // Drift.driftVerdicts end to end in batch mode:
      // the 1995 orders distribution is the stored reference; the 1996
      // slice must pass (true shift ~4% ≪ tolerance even with both
      // sketches erring oppositely at eps=0.01; widest true shift across the
      // three SFs is 4.9% at sf0.001 vs tolerance 0.2) and lineitem prices
      // must fail (~78% below). The single-row head() pulls the few-KB sketch
      // artifact to the driver — the stored-artifact contract (same as
      // VectorIndex/bm25Index loading), bounded by construction. Sketch
      // ESTIMATES stay out of the output (GK merge order); only the exact
      // n_vals payload and the far-from-boundary flags surface, so the
      // result is deterministic at any executor count.
      (s, dir) => {
        import graft.expressions.QSketch
        val o = t(s, dir, "orders")
        val refSk = o.filter(year(col("o_orderdate")) === 1995)
          .agg(QSketch.sketchAgg(col("o_totalprice"), 0.01))
          .head().getAs[Array[Byte]](0)
        val same = o.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_totalprice").as("value"))
        val cross = t(s, dir, "lineitem")
          .select(col("l_extendedprice").as("value"))
        graft.operators.Drift.driftVerdicts(same, refSk, Seq(0.5, 0.95), 0.2)
          .withColumn("pair", lit("orders_1996"))
          .union(graft.operators.Drift
            .driftVerdicts(cross, refSk, Seq(0.5, 0.95), 0.2)
            .withColumn("pair", lit("lineitem_price")))
          .select(col("pair"), col("p"), col("n_vals"), col("drifted"))
      },
      Some("""SELECT 'orders_1996' AS pair, CAST(0.5 AS DOUBLE) AS p,
               (SELECT COUNT(o_totalprice) FROM orders
                WHERE year(o_orderdate) = 1996) AS n_vals,
               FALSE AS drifted
        UNION ALL
        SELECT 'orders_1996', CAST(0.95 AS DOUBLE),
               (SELECT COUNT(o_totalprice) FROM orders
                WHERE year(o_orderdate) = 1996), FALSE
        UNION ALL
        SELECT 'lineitem_price', CAST(0.5 AS DOUBLE),
               (SELECT COUNT(l_extendedprice) FROM lineitem), TRUE
        UNION ALL
        SELECT 'lineitem_price', CAST(0.95 AS DOUBLE),
               (SELECT COUNT(l_extendedprice) FROM lineitem), TRUE""")),

    GQ("x20_benford_digits", // leading-digit distribution (Benford screen) —
      // the data-quality check run over numeric columns to catch synthetic
      // or corrupted value populations. Engine-exact everywhere: the money
      // double goes through the DECIMAL(18,2) discipline (bit-identical on
      // both engines), ×100 is exact decimal → exact cents BIGINT, and the
      // leading digit is integer division by 10^(decimal length − 1)
      // (string length of a positive integer is portable; no float log10,
      // whose x = 10^k boundary cases differ by ULP). One map-side-combined
      // aggregate over the scan; the expected-share comparison is left to
      // the reader of the counts (a chi-square needs float log — x11's KS
      // machinery is the exact in-engine alternative).
      (s, dir) => {
        val cents = col("o_totalprice").cast("decimal(18,2)")
          .multiply(lit(100)).cast("long")
        val digit = cents / pow(lit(10d), length(cents.cast("string")) - 1)
        t(s, dir, "orders")
          .select(floor(digit).cast("int").as("lead_digit"))
          .groupBy("lead_digit").agg(count(lit(1)).as("n_orders"))
      },
      Some("""WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT) AS cents FROM orders)
        -- explicit floor(): DuckDB's // with a DOUBLE divisor is plain
        -- division, and CAST(DOUBLE AS INTEGER) rounds instead of truncating
        SELECT CAST(floor(cents / power(10, length(CAST(cents AS VARCHAR)) - 1))
                 AS INTEGER) AS lead_digit,
               COUNT(*) AS n_orders
        FROM c GROUP BY 1""")),

    GQ("x18_column_profile", // ANALYZE-style column profiling in ONE pass,
      // via the generic operator (`operators/Profiler.profile` — r11: the
      // hard-coded 4-column aggregate became a reusable component; this
      // query is now just a call site). exact=true here because the exact
      // countDistincts ARE the hash-compared oracle payload — that's the
      // variant whose plan carries Catalyst's Expand (rows fan ×5 through
      // one scan). The 100 TB default (exact=false) is single-branch
      // approx-only with NO Expand — plan-asserted in ProfilerSpec — which
      // is why the approx estimates are also surfaced and property-checked
      // here (h01's ±15% HLL bound). The operator's sketched p50/p95 stay
      // OUT of the payload: GK estimates are merge-order dependent.
      (s, dir) => {
        graft.operators.Profiler.profile(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"),
          exact = true)
          .select(col("col_name"), col("n_rows"), col("n_nonnull"),
            col("n_null"), col("n_distinct"),
            // nullif: a zero-row table profiles as n_distinct = 0 with a
            // NULL flag instead of a divide-by-zero error under ANSI mode
            (abs(col("approx_distinct") - col("n_distinct")).cast("double")
              / nullif(col("n_distinct"), lit(0)) <= 0.15).as("approx_ok"))
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
        SELECT 'l_quantity' AS col_name, n_rows, COUNT(l_quantity) AS n_nonnull,
               n_rows - COUNT(l_quantity) AS n_null,
               COUNT(DISTINCT l_quantity) AS n_distinct, TRUE AS approx_ok
        FROM lineitem CROSS JOIN n GROUP BY n_rows
        UNION ALL
        SELECT 'l_extendedprice', n_rows, COUNT(l_extendedprice),
               n_rows - COUNT(l_extendedprice),
               COUNT(DISTINCT l_extendedprice), TRUE
        FROM lineitem CROSS JOIN n GROUP BY n_rows
        UNION ALL
        SELECT 'l_returnflag', n_rows, COUNT(l_returnflag),
               n_rows - COUNT(l_returnflag),
               COUNT(DISTINCT l_returnflag), TRUE
        FROM lineitem CROSS JOIN n GROUP BY n_rows
        UNION ALL
        SELECT 'l_shipdate', n_rows, COUNT(l_shipdate),
               n_rows - COUNT(l_shipdate),
               COUNT(DISTINCT l_shipdate), TRUE
        FROM lineitem CROSS JOIN n GROUP BY n_rows""")),

    GQ("x11_ks_drift", // exact two-sample Kolmogorov–Smirnov drift between
      // corpus slices (en vs de words-per-doc): D = max_v |F_en(v) − F_de(v)|
      // kept as the INTEGER cross-product |cum_en·n_de − cum_de·n_en| (the
      // KS numerator over a common denominator), so the statistic is
      // engine-exact — the drift-monitoring primitive a training pipeline
      // runs between ingestion batches. One aggregate to per-value counts,
      // one running-sum window over the (tiny) distinct-value table.
      (s, dir) => {
        val nw = Tables.table(s, dir, "documents")
          .filter(col("lang").isin("en", "de"))
          .select(col("lang"),
            size(filter(split(col("text"), " "), w => w =!= "")).as("v"))
        val counts = nw.groupBy("v").agg(
          count(when(col("lang") === "en", 1)).as("c_en"),
          count(when(col("lang") === "de", 1)).as("c_de"))
        val w = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
        val cum = counts
          .withColumn("cum_en", sum(col("c_en")).over(w))
          .withColumn("cum_de", sum(col("c_de")).over(w))
          .withColumn("n_en", sum(col("c_en")).over(tot))
          .withColumn("n_de", sum(col("c_de")).over(tot))
        cum.select(col("n_en"), col("n_de"),
          abs(col("cum_en") * col("n_de") - col("cum_de") * col("n_en")).as("d"))
          .agg(max(col("d")).as("ks_num"),
            first(col("n_en")).as("n_en"), first(col("n_de")).as("n_de"))
      },
      Some("""WITH t AS (SELECT lang,
            CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INTEGER) AS v
          FROM documents WHERE lang IN ('en', 'de')),
        c AS (SELECT v,
            COUNT(*) FILTER (lang = 'en') AS c_en,
            COUNT(*) FILTER (lang = 'de') AS c_de
          FROM t GROUP BY v),
        k AS (SELECT
            SUM(c_en) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_en,
            SUM(c_de) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_de,
            SUM(c_en) OVER () AS n_en, SUM(c_de) OVER () AS n_de
          FROM c)
        SELECT CAST(MAX(ABS(cum_en * n_de - cum_de * n_en)) AS BIGINT) AS ks_num,
          CAST(ANY_VALUE(n_en) AS BIGINT) AS n_en,
          CAST(ANY_VALUE(n_de) AS BIGINT) AS n_de
        FROM k""")),

    GQ("q44_market_share", // TPC-H Q8 shape: 7-table star (part, lineitem,
      // orders, customer, supplier, nation×2, region) with selective dim
      // filters, conditional-share aggregation per year. The heaviest join
      // tree in the registry — the fact table shuffles for lineitem⋈orders
      // only; every dim edge is broadcast-able (nation/region hinted,
      // SF-scaled dims left to AQE, the round-2 discipline). Share =
      // ONE division of two decimal-exact sums, so the ratio is
      // bit-deterministic.
      (s, dir) => {
        // decimal-exact volume (cast each factor BEFORE multiplying — the
        // double product rounds differently across engines on tie digits)
        val li = t(s, dir, "lineitem")
          .withColumn("volume", discPrice(col("l_extendedprice"), col("l_discount")))
        val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val sup = t(s, dir, "supplier")
        val n1 = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey")))
        val n2 = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val r = broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n1, col("c_nationkey") === col("c_nk"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(n2, col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(sum(when(col("supp_nation") === "NATION_7", col("volume"))
              .otherwise(lit(0))).cast("double").as("nation_volume"),
            sum(col("volume")).cast("double").as("total_volume"))
          .select(col("o_year"), col("nation_volume"), col("total_volume"),
            (col("nation_volume") / col("total_volume")).as("mkt_share"))
      },
      Some("""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
          CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
              THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS total_volume,
          CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
              THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        GROUP BY 1""")),

    GQ("q34_shipping_priority", // TPC-H Q3 shape: 3-way join, agg, top-10
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        // customer is SF-scaled: no broadcast hint — AQE picks BHJ while the
        // filtered side is small and falls back to SMJ at cluster scale.
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    GQ("q35_volume_by_nation_year", // TPC-H Q7 shape: year extraction + multi-join
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        // customer is SF-scaled (no hint; AQE decides); nation is fixed 25 rows.
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("l_shipdate")).as("l_year"))
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("volume"))
      },
      Some("""SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS l_year,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, year(l_shipdate)""")),

    GQ("q36_returned_revenue", // TPC-H Q10 shape: returned items per customer, top 20
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name, c_acctbal,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    GQ("q39_promo_revenue", // TPC-H Q14 shape: conditional ratio of decimal sums
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        // part is SF-scaled: shuffle join on partkey; AQE broadcasts at small SF.
        val p = t(s, dir, "part")
        li.join(p, col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) *
            sum(when(col("p_type") === "PROMO",
              discPrice(col("l_extendedprice"), col("l_discount"))))
              .cast("double")
            / sum(discPrice(col("l_extendedprice"), col("l_discount")))
              .cast("double")).as("promo_pct"))
      },
      Some("""SELECT 100.0 *
          CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) END) AS DOUBLE)
          / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'""")),

    GQ("q40_small_qty_orders", // TPC-H Q17 shape: per-key avg threshold
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
          .agg((sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity")))
            .as("avg_qty"))
        li.join(avgQty, col("l_partkey") === col("ap_partkey"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(count(lit(1)).as("n_small"),
            dsum(col("l_extendedprice")).as("total_price"))
      },
      Some("""WITH a AS (SELECT l_partkey AS ap_partkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey)
        SELECT COUNT(*) AS n_small,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM lineitem JOIN a ON l_partkey = ap_partkey
        WHERE l_quantity < 0.5 * avg_qty""")),

    GQ("q41_order_count_distribution", // TPC-H Q13 shape: histogram of counts
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT c_count, COUNT(*) AS n_customers FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        GROUP BY c_count""")),

    GQ("q45_topk_agg", // bounded-heap top-k aggregate (native
      // TypedImperativeAggregate `topk_by`, SQL-registered) composing with
      // count/sum in ONE aggregation pass — the shape where the window
      // formulation needs a second aggregate plus a join back (measured
      // 0.5s vs 3.2s at 20M rows / 1000 groups, ScaleSmoke r08). Partial
      // aggregation bounds the shuffle at k rows per group per map
      // partition. The (n_tokens, doc_id) composite ordering is unique per
      // group, so the oracle's ROW_NUMBER replay is deterministic.
      (s, dir) => {
        val docs = Tables.table(s, dir, "documents")
          .select(col("lang"), col("doc_id"),
            tokenCount(col("text")).as("n_tokens"))
        docs.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          graft.expressions.TopKBy.topkBy(
            struct(col("n_tokens"), col("doc_id")), col("doc_id"), 3).as("top"))
          .select(col("lang"), col("n_docs"), col("total_tokens"),
            // Stringified per repo convention: the driver harness
            // canonicalizes rows via pandas and cannot hash raw arrays
            // (q31/d06 do the same).
            expr("array_join(transform(top, s -> s.payload), ',')")
              .as("top_ids"))
      },
      Some("""WITH t AS (SELECT lang, doc_id,
            CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_tokens
          FROM documents),
        r AS (SELECT lang, doc_id, n_tokens,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY n_tokens DESC, doc_id DESC) AS rn
          FROM t),
        top AS (SELECT lang,
                  string_agg(doc_id, ',' ORDER BY rn) AS top_ids
                FROM r WHERE rn <= 3 GROUP BY lang),
        a AS (SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
              FROM t GROUP BY lang)
        SELECT a.lang, a.n_docs, a.total_tokens, top.top_ids
        FROM a JOIN top USING (lang)""")),

    GQ("q30_date_parts",
      (s, dir) =>
        t(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date")),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS y,
        CAST(quarter(o_orderdate) AS INTEGER) AS q,
        CAST(month(o_orderdate) AS INTEGER) AS m,
        CAST(day(o_orderdate) AS INTEGER) AS d,
        o_orderdate + INTERVAL 30 DAY AS due_date
        FROM orders""")),

    GQ("q31_array_funcs",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), words(col("text")).as("ws"))
          .select(col("doc_id"),
            array_join(array_sort(array_distinct(col("ws"))), ",").as("vocab"),
            array_contains(col("ws"), "spark").as("mentions_spark"),
            element_at(col("ws"), 1).as("first_word"),
            element_at(col("ws"), -1).as("last_word")),
      Some("""WITH t AS (SELECT doc_id,
          list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents)
        SELECT doc_id,
          array_to_string(list_sort(list_distinct(ws)), ',') AS vocab,
          list_contains(ws, 'spark') AS mentions_spark,
          ws[1] AS first_word, ws[-1] AS last_word
        FROM t""")),

    GQ("q32_string_funcs2",
      (s, dir) =>
        t(s, dir, "part").select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("brand_padded"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_translated"),
          reverse(col("p_type")).as("type_reversed"),
          repeat(col("p_brand"), 2).as("brand_twice"),
          trim(lit("  x  ")).as("trimmed")),
      Some("""SELECT p_partkey,
        lpad(p_brand, 12, '*') AS brand_padded,
        translate(p_name, 'aeiou', 'AEIOU') AS name_translated,
        reverse(p_type) AS type_reversed,
        repeat(p_brand, 2) AS brand_twice,
        trim('  x  ') AS trimmed
        FROM part""")),

    GQ("q33_custom_topk", // custom LogicalPlan node, lowered by our Rule
      (s, dir) => graft.plans.TopKPerGroup(
        t(s, dir, "part").select("p_partkey", "p_brand", "p_retailprice"),
        groupCols = Seq("p_brand"), orderCol = "p_partkey",
        descending = false, k = 2),
      Some("""SELECT p_partkey, p_brand, p_retailprice FROM (
          SELECT p_partkey, p_brand, p_retailprice,
            ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
          FROM part) WHERE rn <= 2""")),

    GQ("f01_nested_struct",
      // Build the nested struct in the plan (exercises StructType create +
      // field access), then serialize with to_json so the oracle harness can
      // sort/hash the column (it cannot canonicalize raw struct values).
      // Both engines emit compact JSON with insertion-ordered keys; the source
      // columns are non-null so Spark's drop-null-keys behavior is moot.
      (s, dir) => {
        val withMeta = t(s, dir, "orders").select(
          col("o_orderkey"),
          struct(col("o_orderstatus").as("status"),
            col("o_orderpriority").as("pri")).as("meta"))
        withMeta.select(
          col("o_orderkey"),
          col("meta.status").as("status_field"), // nested field access
          to_json(col("meta")).as("meta_json"))
      },
      Some("""SELECT o_orderkey,
        o_orderstatus AS status_field,
        to_json({'status': o_orderstatus, 'pri': o_orderpriority}) AS meta_json
        FROM orders""")),

    GQ("ts04_ewma_spike", // EWMA-smoothed daily event volume per type
      // with spike flags (`operators/Smoothing` — Hunter 1986's EWMA
      // control chart, the operational "is today anomalous" baseline
      // beside x19/x26's whole-distribution gates). EWMA is a sequential
      // recurrence, not a window aggregate: the corpus reduces map-side
      // to the (type, day) cell table first (the ONLY corpus-scale
      // work), each type's calendar-bounded series folds scan-locally
      // via the aggregate HOF in integer fixed point — e_t = (x_t·α +
      // e_{t−1}·(1−α)) DIV 1e6 millionths, e_0 = x_0 — so every step
      // hash-replays and the oracle unrolls the same recurrence with a
      // recursive CTE (pk01's replay discipline). Spike = the 2σ Poisson
      // control band around the PRIOR day's smoothed level — integer
      // form (x − e)² > 4·e, which scales the alarm width with √level
      // (a fixed RATIO threshold goes silently vacuous as volume grows:
      // relative noise shrinks ∝ 1/√n — measured 66 trips at sf0.001 vs
      // 0 at sf0.1 for a 1.2× rule; the σ-scaled band trips both ways
      // at every SF). Lag, not current ewma, so a spike can't mask
      // itself through its own contribution; first days coalesce to
      // false — no baseline, no evidence.
      (s, dir) => {
        val cells = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
          .agg(count(lit(1)).as("n_events"))
        val sm = graft.operators.Ewma.smooth(
          cells, "event_type", "d", "n_events", alphaPpm = 250000L)
        val w = Window.partitionBy("event_type").orderBy("d")
        val pe = lag(col("ewma"), 1).over(w)
        sm.withColumn("spike",
          coalesce((col("n_events") - pe) * (col("n_events") - pe)
            > lit(4L) * pe, lit(false)))
      },
      Some("""WITH RECURSIVE c AS (SELECT event_type,
            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        idx AS (SELECT event_type, d, x,
            CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
          FROM c),
        rec AS (
          SELECT event_type, d, x, i, x AS ewma FROM idx WHERE i = 1
          UNION ALL
          SELECT idx.event_type, idx.d, idx.x, idx.i,
            (idx.x * 250000 + rec.ewma * 750000) // 1000000 AS ewma
          FROM idx JOIN rec
            ON idx.event_type = rec.event_type AND idx.i = rec.i + 1),
        lagd AS (SELECT event_type, d, x, ewma,
            lag(ewma) OVER (PARTITION BY event_type ORDER BY d) AS pe
          FROM rec)
        SELECT event_type, d, x AS n_events, ewma,
          COALESCE((x - pe) * (x - pe) > 4 * pe, FALSE) AS spike
        FROM lagd"""))
  ,

    GQ("ts02_theilsen_trend", // Theil–Sen robust trend per event type
      // (`operators/Smoothing.Trend` — Theil 1950 / Sen 1968): the
      // median of all pairwise slopes of the daily-volume series, a
      // 29%-breakdown estimator where OLS is dragged by one outlier
      // day. The TREND member of the monitoring family (ts04 watches
      // the level, ts03 sustained shifts). Integer-exact: slope_ppm =
      // (x_j−x_i)·1e6 DIV (t_j−t_i) over an integral day index — both
      // engines' integral division truncates toward zero (verified),
      // so NEGATIVE slopes replay — and the median is percentile_disc's
      // exact order statistic. The pairwise self-join runs on the
      // calendar-bounded CELL table (30 days → 435 slope rows per key,
      // planner-scale); the corpus reduced map-side first.
      (s, dir) => {
        val cells = Tables.events(s, dir)
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts")),
              lit("2024-01-01").cast("date")).as("d"))
          .agg(count(lit(1)).as("x"))
        graft.operators.Trend.theilSen(cells, "event_type", "d", "x")
      },
      Some("""WITH c AS (SELECT event_type,
            CAST(date_diff('day', DATE '2024-01-01',
              CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        p AS (SELECT a.event_type,
            ((b.x - a.x) * 1000000) // (b.d - a.d) AS sl
          FROM c a JOIN c b ON a.event_type = b.event_type AND a.d < b.d),
        med AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
            CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY sl) AS BIGINT)
              AS slope_ppm
          FROM p GROUP BY 1),
        np AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM c GROUP BY 1)
        SELECT med.event_type, n_points, n_pairs, slope_ppm
        FROM med JOIN np ON med.event_type = np.event_type""")),

    GQ("ts03_cusum_shift", // one-sided upper CUSUM change-point chart
      // (`operators/Smoothing.Cusum`, Page 1954): accumulates small
      // SUSTAINED level shifts until they cross the decision interval —
      // the detector for "volume crept up 1σ and stayed", which ts04's
      // per-day band rarely trips on. Parameters fit on the IN-CONTROL
      // reference window (days before Jan 22 — proper chart usage);
      // target = the key's discrete median, allowance ½σ (kept integral
      // by running the statistic in DOUBLED units), interval 4σ, σ =
      // max(isqrt(median), 1) (Poisson, floored so zero-median sparse
      // keys don't alarm on their first nonzero cell; one
      // correctly-rounded IEEE sqrt, d46's precedent). The corpus carries no real level shift (measured:
      // zero alarms at sf0.01/0.1 under these parameters — the series
      // IS in control), so the query injects a DETERMINISTIC 1σ shift
      // onto click's last 9 days (d14's injection discipline, replayed
      // by the oracle) and the chart detects it: first alarm Jan 27 at
      // sf0.01, Jan 23 at sf0.1 — detection lag shrinking with volume,
      // exactly the CUSUM promise. All integer ⇒ every s2 value
      // hash-replays; oracle unrolls the recurrence recursively.
      (s, dir) => {
        val cells0 = Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        val med0 = cells0.groupBy("event_type")
          .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)")
            .as("med"))
        val shifted = cells0.join(broadcast(med0), "event_type")
          .select(col("event_type"), col("d"),
            (col("x") + when(col("event_type") === "click"
                && col("d") >= lit("2024-01-22").cast("timestamp"),
              expr("CAST(floor(sqrt(med)) AS BIGINT)")).otherwise(0L)).as("x"))
        graft.operators.Cusum.poissonUpper(
          shifted, "event_type", "d", "x", l = 4,
          reference = Some(shifted.filter(
            col("d") < lit("2024-01-22").cast("timestamp"))))
      },
      Some("""WITH RECURSIVE c0 AS (SELECT event_type,
            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        m0 AS (SELECT event_type,
            CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT) AS med
          FROM c0 GROUP BY 1),
        c AS (SELECT c0.event_type, d,
            x + CASE WHEN c0.event_type = 'click' AND d >= TIMESTAMP '2024-01-22'
              THEN CAST(floor(sqrt(med)) AS BIGINT) ELSE 0 END AS x
          FROM c0 JOIN m0 USING (event_type)),
        m AS (SELECT event_type,
            CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT) AS med
          FROM c WHERE d < TIMESTAMP '2024-01-22' GROUP BY 1),
        m2 AS (SELECT event_type,
            2 * med + greatest(CAST(floor(sqrt(med)) AS BIGINT), 1) AS k2,
            2 * 4 * greatest(CAST(floor(sqrt(med)) AS BIGINT), 1) AS h2
          FROM m),
        idx AS (SELECT c.event_type, d, x, k2, h2,
            CAST(row_number() OVER (PARTITION BY c.event_type ORDER BY d) AS BIGINT) AS i
          FROM c JOIN m2 USING (event_type)),
        rec AS (
          SELECT event_type, d, x, k2, h2, i,
            greatest(CAST(0 AS BIGINT), 2 * x - k2) AS s2
          FROM idx WHERE i = 1
          UNION ALL
          SELECT idx.event_type, idx.d, idx.x, idx.k2, idx.h2, idx.i,
            greatest(CAST(0 AS BIGINT), rec.s2 + 2 * idx.x - idx.k2)
          FROM idx JOIN rec
            ON idx.event_type = rec.event_type AND idx.i = rec.i + 1)
        SELECT event_type, d, x, s2 AS cusum2, h2, s2 > h2 AS alarm
        FROM rec""")),

    GQ("cdc02_replica_apply", // the CONSUMER side of cdc01's change feed:
      // reconstruct v2 from v1 plus the feed ALONE — the contract that
      // makes a change feed a replication mechanism rather than a report.
      // Retract = anti join on delete/update_pre ids (delta-sized, so
      // broadcast — the same shape as MergeOnRead's read path), apply =
      // union of insert/update_post payload rows; neither snapshot is
      // re-read. The oracle rebuilds v2 declaratively from the base
      // table, so feed production AND application are both under test:
      // any drift between changeFeed's emitted ops and their intended
      // semantics shows up as a replica mismatch here even if cdc01's
      // shape check passes.
      (s, dir) => {
        val root = cdcOrders(s, dir)
        val v1 = graft.operators.Snapshot.readVersion(s, root, Some(1))
        val feed = graft.operators.Snapshot.changeFeed(
          v1, graft.operators.Snapshot.readVersion(s, root, Some(2)),
          idCol = "o_orderkey", payloadCols = Seq("o_totalprice"))
        val retract = feed
          .filter(col("op").isin("delete", "update_pre"))
          .select(col("o_orderkey"))
        val apply = feed
          .filter(col("op").isin("insert", "update_post"))
          .select(col("o_orderkey"), col("o_totalprice"))
        v1.join(broadcast(retract), Seq("o_orderkey"), "left_anti")
          .unionByName(apply)
      },
      Some("""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
            WHERE year(o_orderdate) = 1996),
        bumped AS (SELECT k, CASE WHEN k % 7 = 0 THEN p + 1000.0 ELSE p END AS p
                   FROM v1)
        SELECT k AS o_orderkey, p AS o_totalprice FROM bumped WHERE k % 13 <> 0
        UNION ALL
        SELECT k + 1000000000, p FROM v1 WHERE k % 17 = 0""")),

    GQ("fs02_pit_two_dims", // point-in-time feature join over TWO SCD2
      // dimension histories at once — the real feature-store shape
      // (facts rarely reference a single dimension): each lineitem is
      // enriched with the supplier balance AND the part retail price AS
      // THEY WERE at ship time (ship years mapped to dim versions 1/2).
      // Two chained as-of joins (fs01's machinery, one shuffle + window
      // each, never a non-equi range join); the asof_* outputs rename
      // between hops so the second dimension's columns never collide
      // with the first's. Both dims bump disjoint key slices (%4 / %5),
      // so all four (sup_v, part_v) version combinations appear and a
      // temporal-leakage bug on EITHER axis breaks the aggregate. Oracle
      // states both lookups declaratively with interval predicates.
      (s, dir) => {
        val supHist = Scd.history(s, scdSuppliers(s, dir))
          .select("s_suppkey", "scd_valid_from", "s_acctbal")
        val partHist = Scd.history(s, scdParts(s, dir))
          .select("p_partkey", "scd_valid_from", "p_retailprice")
        val facts = t(s, dir, "lineitem").select(
          col("l_suppkey"), col("l_partkey"), col("l_extendedprice"),
          when(year(col("l_shipdate")) <= 1996, 1L).otherwise(2L)
            .as("fact_v"))
        val withSup = AsOfJoin.asofJoin(facts, supHist,
          leftKey = "l_suppkey", rightKey = "s_suppkey",
          leftTime = "fact_v", rightTime = "scd_valid_from",
          payload = Seq("scd_valid_from", "s_acctbal"),
          rightTiebreak = "s_suppkey")
          .withColumnRenamed("asof_scd_valid_from", "sup_v")
          .withColumnRenamed("asof_s_acctbal", "sup_bal")
        AsOfJoin.asofJoin(withSup, partHist,
          leftKey = "l_partkey", rightKey = "p_partkey",
          leftTime = "fact_v", rightTime = "scd_valid_from",
          payload = Seq("scd_valid_from", "p_retailprice"),
          rightTiebreak = "p_partkey")
          .withColumnRenamed("asof_scd_valid_from", "part_v")
          .withColumnRenamed("asof_p_retailprice", "part_retail")
          .groupBy(col("fact_v"), col("sup_v"), col("part_v"))
          .agg(count(lit(1)).as("n_items"),
            Dec.dsum(col("l_extendedprice")).as("revenue"),
            Dec.dsum(col("sup_bal")).as("bal_sum"),
            Dec.dsum(col("part_retail")).as("retail_sum"))
      },
      Some("""WITH sh AS (
          SELECT s_suppkey, s_acctbal AS bal, 1 AS vf, 2 AS vt
            FROM supplier WHERE s_suppkey % 4 = 0
          UNION ALL SELECT s_suppkey, s_acctbal, 1, NULL
            FROM supplier WHERE s_suppkey % 4 <> 0
          UNION ALL SELECT s_suppkey, s_acctbal + 100.0, 2, NULL
            FROM supplier WHERE s_suppkey % 4 = 0),
        ph AS (
          SELECT p_partkey, p_retailprice AS retail, 1 AS vf, 2 AS vt
            FROM part WHERE p_partkey % 5 = 0
          UNION ALL SELECT p_partkey, p_retailprice, 1, NULL
            FROM part WHERE p_partkey % 5 <> 0
          UNION ALL SELECT p_partkey, p_retailprice + 10.0, 2, NULL
            FROM part WHERE p_partkey % 5 = 0),
        f AS (SELECT l_suppkey, l_partkey, l_extendedprice,
          CAST(CASE WHEN year(l_shipdate) <= 1996 THEN 1 ELSE 2 END
            AS BIGINT) AS fact_v FROM lineitem)
        SELECT f.fact_v, CAST(sh.vf AS BIGINT) AS sup_v,
          CAST(ph.vf AS BIGINT) AS part_v,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(f.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue,
          CAST(SUM(CAST(sh.bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum,
          CAST(SUM(CAST(ph.retail AS DECIMAL(18,2))) AS DOUBLE)
            AS retail_sum
        FROM f
        JOIN sh ON f.l_suppkey = sh.s_suppkey AND sh.vf <= f.fact_v
          AND (sh.vt IS NULL OR sh.vt > f.fact_v)
        JOIN ph ON f.l_partkey = ph.p_partkey AND ph.vf <= f.fact_v
          AND (ph.vt IS NULL OR ph.vt > f.fact_v)
        GROUP BY 1, 2, 3"""))
  )
}
