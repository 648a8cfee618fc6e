package graft.queries

import graft.{Dec, GQ, Tables}
import graft.Dec._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface (SURVEY.md §2.2): scans, filter/project,
  * joins (broadcast/shuffle, semi/anti/outer), aggregation (incl. distinct,
  * rollup/cube), windows (ranking/running/lag), sort/limit/top-k, set ops,
  * scalar functions, date/time, JSON-ish extraction, sessionization and
  * as-of-style windows over the events table.
  *
  * Every query is written scale-first:
  *  - fixed-size dimension tables (nation=25, region=5, scalar subquery
  *    results) are explicitly `broadcast()`; SF-scaled tables (customer,
  *    part) carry no hint so AQE broadcasts while small and falls back to a
  *    shuffle join at cluster scale instead of OOMing on a forced hint;
  *  - filters/projections are plain Column expressions → pushed to parquet;
  *  - per-group top-k uses window + filter (no driver-side collect);
  *  - exact-decimal aggregation (graft.Dec) keeps results bit-identical to
  *    the DuckDB oracle regardless of accumulation order/parallelism.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val queries: Seq[GQ] = Seq(
    // ---------------------------------------------------------- aggregation
    GQ("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(discPrice(col("l_extendedprice"), col("l_discount")))
              .cast("double").as("sum_disc_price"),
            sum(discPrice(col("l_extendedprice"), col("l_discount")) *
                (lit(1) + dec(col("l_tax")))).cast("double").as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")),

    GQ("q02_filter_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
            && col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
            discPrice(col("l_extendedprice"), col("l_discount"))
              .cast("double").as("disc_price")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
        CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS disc_price
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND l_quantity < 10""")),

    GQ("q03_revenue_forecast", // TPC-H Q6 shape
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount").between(0.02, 0.06)
            && col("l_quantity") < 24)
          .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""")),

    // ---------------------------------------------------------------- joins
    GQ("q04_brand_revenue", // fact × dim join; dim is SF-scaled so no hint
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val part = t(s, dir, "part")
        // part grows with SF (20k/SF rows): let AQE broadcast while small and
        // shuffle-join at cluster scale instead of forcing an OOM-able hint.
        li.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            sum(discPrice(col("l_extendedprice"), col("l_discount")))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT p_brand,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    GQ("q05_nation_revenue", // multi-way join through the star schema
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        // customer is SF-scaled (AQE decides); nation (25) / region (5) are
        // fixed-size and stay hinted.
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
      },
      Some("""SELECT r_name, n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY r_name, n_name""")),

    GQ("q06_big_spenders_semi", // left-semi ≡ EXISTS
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)""")),

    GQ("q07_no_big_orders_anti", // left-anti ≡ NOT EXISTS
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_nationkey")
      },
      Some("""SELECT c_custkey, c_nationkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)""")),

    GQ("q08_customer_orders_outer",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(dec(col("o_totalprice"))), lit(0))
              .cast("double").as("total_spent"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey""")),

    // -------------------------------------------------------------- windows
    GQ("q09_top3_orders_per_customer",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3""")),

    GQ("q42_topk_salted", // two-phase (group, salt) ranking — identical rows
      // to q09's plain window (sans rank), oracled with the plain-window SQL.
      // NOTE (measured, PLANS.md): Spark 4's WindowGroupLimit already makes
      // the plain rank filter hot-key-safe, so this variant is the
      // generality hatch (pre-4.x engines / non-rank windows), not a perf
      // recommendation on this engine.
      (s, dir) => graft.operators.TopK.perGroupSalted(
        t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k = 3,
        saltOf = xxhash64(col("o_orderkey")), salts = 8),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3""")),

    GQ("q10_running_spend",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spent"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spent
        FROM orders""")),

    GQ("q43_running_bucketed", // hot-key hatch for unbounded running sums:
      // identical rows to q10 via within-bucket running + prefix of bucket
      // totals (exact under decimal addition), oracled with q10's SQL
      (s, dir) => {
        val d = t(s, dir, "orders")
          .withColumn("d", datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
          .withColumn("v", dec(col("o_totalprice")))
        graft.operators.RunningAgg.runningSumBucketed(
          d, "o_custkey", "d", Seq("o_orderkey"), "v",
          bucketWidth = 365, out = "rs")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("rs").cast("double").as("running_spent"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spent
        FROM orders""")),

    GQ("q11_order_deltas", // lag/lead analytics
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            (dec(col("o_totalprice")) - dec(lag(col("o_totalprice"), 1).over(w)))
              .cast("double").as("price_delta"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
             CAST(LAG(o_totalprice, 1) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS price_delta
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // ------------------------------------------------------- sort / limit
    GQ("q12_top100_items", // global top-k → TakeOrderedAndProject, no full sort
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""")),

    // ---------------------------------------------------- distinct / setops
    GQ("q13_distinct_segments",
      (s, dir) => t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct(),
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")),

    GQ("q14_count_distinct",
      (s, dir) =>
        t(s, dir, "orders").groupBy("o_orderstatus")
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders")),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus""")),

    GQ("q15_rollup_flags",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    GQ("q16_cube_status",
      (s, dir) =>
        t(s, dir, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    GQ("q17_union_tagged",
      (s, dir) => {
        val p = t(s, dir, "part")
        p.filter(col("p_size") < 10)
          .select(col("p_partkey"), lit("small").as("tag"))
          .unionAll(
            p.filter(col("p_retailprice") > 990)
              .select(col("p_partkey"), lit("pricey").as("tag")))
      },
      Some("""SELECT p_partkey, 'small' AS tag FROM part WHERE p_size < 10
        UNION ALL
        SELECT p_partkey, 'pricey' AS tag FROM part WHERE p_retailprice > 990""")),

    GQ("q18_intersect_customers",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")),

    GQ("q19_except_customers",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.select("c_custkey")
          .except(o.filter(col("o_orderstatus") === "F")
            .select(col("o_custkey").as("c_custkey")))
      },
      Some("""SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    GQ("q18b_intersect_all", // multiset semantics (duplicates preserved)
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersectAll(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")),

    GQ("q19b_except_all",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select("o_custkey")
          .exceptAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    // ---------------------------------------------------- scalar functions
    GQ("q20_string_funcs",
      (s, dir) =>
        t(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_type"), 1, 4).as("type_prefix"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
          split(col("p_name"), " ").getItem(0).as("first_word")),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
        substring(p_type, 1, 4) AS type_prefix,
        CAST(length(p_name) AS INTEGER) AS name_len,
        p_brand || '/' || p_type AS brand_type,
        regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        string_split(p_name, ' ')[1] AS first_word
        FROM part""")),

    GQ("q21_monthly_revenue",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue")),
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY date_trunc('month', o_orderdate)""")),

    GQ("q22_price_buckets",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("bucket",
            when(col("o_totalprice") < 100000, "low")
              .when(col("o_totalprice") < 300000, "mid")
              .otherwise("high"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total")),
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                   WHEN o_totalprice < 300000 THEN 'mid'
                   ELSE 'high' END AS bucket,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1""")),

    GQ("q23_having_spend",
      (s, dir) =>
        t(s, dir, "orders").groupBy("o_custkey")
          .agg(dsum(col("o_totalprice")).as("spent"))
          .filter(col("spent") > 1000000),
      Some("""SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        FROM orders GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 1000000""")),

    GQ("q24_above_avg_balance", // scalar subquery via broadcast cross-join
      (s, dir) => {
        val c = t(s, dir, "customer")
        val avgBal = c.agg(davg(col("c_acctbal")).as("avg_bal"))
        c.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .select("c_custkey", "c_acctbal")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) FROM customer)""")),

    GQ("q25_brand_price_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
        t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
            dense_rank().over(w).as("price_rank"))
      },
      Some("""SELECT p_partkey, p_brand, p_retailprice,
        CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS price_rank
        FROM part""")),

    // ------------------------------------------------------- events / time
    GQ("q26_events_hourly",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2""")),

    GQ("q27_sessionize", // 30-min-gap sessionization (gaps-and-islands)
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("new_sess",
            when(lag(col("ts"), 1).over(w).isNull
              || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("min_event_id"),
            max(col("event_id")).as("max_event_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsm FROM events),
        m AS (SELECT user_id, event_id, tsm,
                CASE WHEN LAG(tsm, 1) OVER w IS NULL
                          OR epoch_us(tsm) - epoch_us(LAG(tsm, 1) OVER w) > 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsm, event_id)),
        sess AS (SELECT user_id, event_id,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsm, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                 FROM m)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id
        FROM sess GROUP BY user_id, session_id""")),

    GQ("q28_events_json",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"),
            (sum(col("k")).cast("double") / count(col("k"))).as("avg_k")),
      Some("""SELECT event_type,
        CAST(SUM(k) AS BIGINT) AS sum_k,
        CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
        FROM (SELECT event_type,
                CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
              FROM events) GROUP BY event_type""")),

    GQ("q29_last_error_before_click", // as-of-style window: latest prior event
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("last_error_ts",
            max(when(col("event_type") === "error", col("ts"))).over(w))
          .filter(col("event_type") === "click")
          .select("user_id", "event_id", "last_error_ts")
      },
      Some("""SELECT user_id, event_id, last_error_ts FROM (
          SELECT user_id, event_id, event_type,
            MAX(CASE WHEN event_type = 'error' THEN tsm END) OVER
              (PARTITION BY user_id ORDER BY tsm, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_ts
          FROM (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS tsm FROM events))
        WHERE event_type = 'click'""")),

    GQ("ts01_gapfill_locf", // fixed-interval resampling with gap fill +
      // last-observation-carried-forward (`operators/Resample.gapFillLocf`):
      // the irregular event stream densified to each user's hourly grid —
      // empty hours materialize with n_events = 0 and carry the previous
      // hour's last observed value forward. Buckets are epoch-microsecond
      // integer division (timezone-free, replayable); the bucket's "last"
      // observation is the (ts, event_id)-max row, so the carried double is
      // one deterministic row's value, not a float fold. Plan: TWO post-agg
      // exchanges — events reduce map-side to (key, bucket) cells, cells
      // gather per key, and the grid expands IN PLACE via sequence() over a
      // bucket→cell map (no grid×cells join); the LOCF window runs on the
      // partitioning the groupBy produced (no third exchange). Per-key cost
      // is span/step cells — the resample horizon, never event volume.
      (s, dir) => graft.operators.Resample.gapFillLocf(
        Tables.events(s, dir), "user_id", "ts", "event_id", "value",
        stepMicros = 3600L * 1000000L),
      Some("""WITH e AS (SELECT user_id, event_id, value,
            epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
        r AS (SELECT user_id, tu // 3600000000 AS bucket, value,
            ROW_NUMBER() OVER (PARTITION BY user_id, tu // 3600000000
                               ORDER BY tu DESC, event_id DESC) AS rn
          FROM e),
        cells AS (SELECT user_id, bucket,
            CAST(COUNT(*) AS BIGINT) AS n_events,
            MAX(CASE WHEN rn = 1 THEN value END) AS last_v
          FROM r GROUP BY 1, 2),
        span AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM cells GROUP BY 1),
        grid AS (SELECT user_id, UNNEST(generate_series(lo, hi)) AS bucket
          FROM span),
        j AS (SELECT g.user_id, g.bucket,
            COALESCE(c.n_events, 0) AS n_events, c.last_v
          FROM grid g LEFT JOIN cells c
            ON c.user_id = g.user_id AND c.bucket = g.bucket)
        SELECT user_id,
          make_timestamp(bucket * 3600000000) AS bucket_ts,
          n_events,
          last_value(last_v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
        FROM j"""))
  )
}
