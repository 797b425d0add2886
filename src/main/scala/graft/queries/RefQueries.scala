package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Cleanup.PersistTrackedOps
import graft.core.{Stable, Tables}
import graft.ops.{Dedup, Scalars}

/** The reference's operator inventory (SURVEY §2), one named query per
  * operator family, run on the driver's TPC-H-ish corpus (SURVEY §7.1).
  * Every query is deterministically ordered and type-stabilized so the
  * DuckDB oracle hash-matches.
  */
object RefQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Shared decimal-stable revenue term: l_extendedprice*(1-l_discount).
    * Oracle form: CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS
    * DECIMAL(18,4))) AS DOUBLE). */
  private def revenue: Column =
    Stable.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)

  /** lineitem⋈orders⋈customer⋈nation⋈region star join (J1; reference join
    * surface: the Power BI star model over `DDL Final.sql` FK edges,
    * SURVEY §2.4). nation/region are broadcast (tiny dims — no shuffle of
    * the fact side for them even at 100 TB); the fact-side joins shuffle
    * on their keys and AQE handles skew.
    *
    * lineitem revenue is PARTIAL-AGGREGATED to order grain
    * BELOW the join (for queries whose group keys all come from the
    * orders/customer side): the orderkey groupBy's map-side combine
    * collapses ~4 lineitems per order before the first join shuffle, so
    * every downstream exchange carries order-grain rows — at 100 TB that
    * is the difference between shuffling the fact table twice and once.
    * The partial sums stay DECIMAL, so the two-level sum is exactly the
    * flat decimal sum (associativity) and the oracle SQL is unchanged.
    * Finalize with `sum(rev_dec).cast("double")` / `sum(n_part)`. */
  private def starOrderGrain(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev_dec"),
        count(lit(1)).as("n_part"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))

  private def revFinal: Column = sum(col("rev_dec")).cast("double")
  private def itemsFinal: Column = sum(col("n_part"))

  /** One SQL text, two engines (q77): runs verbatim through Spark's
    * parser AND as its own DuckDB oracle. Decimal-stabilized sum per
    * NOTES oracle-parity rule 1. */
  private val portableSql: String =
    """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin

  /** One SQL text, two engines (q87): correlated subquery forms. */
  private val subquerySql: String =
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_totalprice > 150000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderstatus = 'F' AND o.o_totalprice < 5000)
      |ORDER BY c_custkey""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // q01 — D1 distinct + O1 sort desc + F1 calendar split: the reference's
    // date-dimension pipeline (`airflow/dags/date_etl.py`) verbatim in
    // semantics. Also the flagship `entry` query.
    QuerySpec("q01_dates_dim",
      (s, dir) =>
        t(s, dir, "orders")
          .select(to_date(col("o_orderdate")).as("date")).distinct()
          .select(col("date") +: Scalars.calendar(col("date")): _*)
          .orderBy(col("date").desc),
      Some("""SELECT date, CAST(day(date) AS INTEGER) AS day,
             | CAST(month(date) AS INTEGER) AS month,
             | CAST(year(date) AS INTEGER) AS year
             |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date FROM orders)
             |ORDER BY date DESC""".stripMargin)),

    // q02 — D2 keep-first key dedup with explicit total order
    // (`airflow/dags/location_etl.py:19` family): first order per customer.
    QuerySpec("q02_dedup_keepfirst",
      (s, dir) =>
        Dedup.keepFirst(t(s, dir, "orders"), Seq("o_custkey"),
            Seq(col("o_orderdate").asc, col("o_orderkey").asc))
          .orderBy("o_custkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // q03 — D3 composite-key dedup (`airflow/dags/laps_etl.py:34-56`):
    // first shipment per (part, supplier). Aggregate form (struct-min with
    // map-side combine), not a window: the window sorts all input rows
    // inside the shuffle, this shuffles one row per key. (l_shipdate,
    // l_orderkey, l_linenumber) totally orders each group in this corpus,
    // so both forms pick the same survivor. Persisted before the global
    // sort so the range-partitioner sampling pass doesn't re-run the agg.
    QuerySpec("q03_dedup_composite",
      (s, dir) =>
        Dedup.keepFirstAgg(t(s, dir, "lineitem"), Seq("l_partkey", "l_suppkey"),
            Seq("l_shipdate", "l_orderkey", "l_linenumber"), Seq("l_quantity"))
          .persistTracked()
          .orderBy("l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_shipdate
             |FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey, l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn FROM lineitem)
             |WHERE rn = 1 ORDER BY l_partkey, l_suppkey""".stripMargin)),

    // q04 — D1 full-row distinct over a projection.
    QuerySpec("q04_distinct_pair",
      (s, dir) =>
        t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
          .distinct().orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // q05 — P1/P2 projection + rename (`airflow/dags/location_etl.py:31-38`
    // dict-rebuild renames, as aliases pushed into the scan).
    QuerySpec("q05_project_rename",
      (s, dir) =>
        t(s, dir, "customer").select(
          col("c_custkey").as("cust_id"), col("c_name").as("cust_name"),
          col("c_nationkey").as("nation_id"), col("c_acctbal").as("balance"),
          col("c_mktsegment").as("segment")).orderBy("cust_id"),
      Some("""SELECT c_custkey AS cust_id, c_name AS cust_name, c_nationkey AS nation_id,
             | c_acctbal AS balance, c_mktsegment AS segment
             |FROM customer ORDER BY cust_id""".stripMargin)),

    // q06 — P4/P5/P6 null-guard + value filters
    // (`airflow/dags/fpractice_etl.py:47`, `sprint_etl.py:49`).
    QuerySpec("q06_filter_nulls",
      (s, dir) =>
        t(s, dir, "events")
          .filter(coalesce(col("value"), lit(0.0)) > 100 && col("props").isNotNull)
          .select("event_id", "user_id", "event_type", "value")
          .orderBy("event_id"),
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE coalesce(value, 0) > 100 AND props IS NOT NULL
             |ORDER BY event_id""".stripMargin)),

    // q07 — J1 star-schema join + A3 aggregate: revenue per region/nation,
    // over the order-grain pre-aggregated star (see starOrderGrain).
    QuerySpec("q07_star_join_revenue",
      (s, dir) =>
        starOrderGrain(s, dir).groupBy("r_name", "n_name")
          .agg(revFinal.as("revenue"), itemsFinal.as("n_items"))
          .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name,
             | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             | count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // q08 — J2 referential-integrity anti-join (`DDL Final.sql:140-161`):
    // customers with no orders.
    QuerySpec("q08_orphan_customers",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // q09 — J3 existence semi-join (deleted dev iteration's per-row
    // `SELECT COUNT(*)` probe, set-oriented).
    QuerySpec("q09_active_customers",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // q10 — A3 grouped aggregates (TPC-H Q1 shape: the BI sums/averages of
    // `README.md:10-18` over measures). Partial+final hash agg, map-side
    // combine — the 100 TB-safe default.
    QuerySpec("q10_pricing_summary",
      (s, dir) =>
        t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
          Stable.dsum(col("l_quantity"), 2).as("sum_qty"),
          Stable.dsum(col("l_extendedprice"), 2).as("sum_base"),
          revenue.as("sum_disc_price"),
          count(lit(1)).as("count_order"))
          // tiny result, expensive child: persist so the range-sampling
          // pass doesn't re-run the decimal aggregation (NOTES perf rule)
          .persistTracked()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             | count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // q11 — A2 existence/count probe as a set-oriented groupBy count.
    QuerySpec("q11_event_counts",
      (s, dir) =>
        t(s, dir, "events").groupBy("event_type")
          .agg(count(lit(1)).as("n")).orderBy("event_type"),
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type")),

    // q12 — §2.6 ranking window (standings recomputation cross-check:
    // `rank()` over partition, `DDL Final.sql:110-120` semantics).
    QuerySpec("q12_rank_in_nation",
      (s, dir) =>
        t(s, dir, "customer").select(
          col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          rank().over(Window.partitionBy("c_nationkey")
            .orderBy(col("c_acctbal").desc, col("c_custkey"))).as("rnk"))
          .orderBy("c_nationkey", "rnk", "c_custkey"),
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
             | CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rnk
             |FROM customer ORDER BY c_nationkey, rnk, c_custkey""".stripMargin)),

    // q13 — O3 top-k: aggregate-then-join (pre-aggregation keeps the join
    // input small at scale), TakeOrderedAndProject for the global top-10.
    QuerySpec("q13_topk_customers",
      (s, dir) => {
        val rev = t(s, dir, "orders").groupBy("o_custkey")
          .agg(Stable.dsum(col("o_totalprice"), 2).as("revenue"))
        rev.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey")).limit(10)
      },
      Some("""SELECT c_custkey, c_name,
             | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin)),

    // q14 — O2 sort asc + O3 row cap (`CompleteETL.py:796-801` 1000-row
    // Laps cap — here an honest ordered limit, not a workaround).
    QuerySpec("q14_limit_cap",
      (s, dir) =>
        // (l_orderkey, l_linenumber) is NOT unique in this corpus — include
        // l_quantity so the order is total over the projected columns and
        // the limit cut is deterministic.
        t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity").limit(1000),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 1000""".stripMargin)),

    // q15 — F1 calendar split per row (`date_etl.py:28-30`).
    QuerySpec("q15_calendar_split",
      (s, dir) =>
        t(s, dir, "orders").select(
            col("o_orderkey") +: Scalars.calendar(to_date(col("o_orderdate"))): _*)
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             | CAST(day(CAST(o_orderdate AS DATE)) AS INTEGER) AS day,
             | CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS month,
             | CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS year
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // q16 — F2 age derivation, fixed reference year for determinism
    // (`driver_etl.py:49` is NOT birthday-adjusted; neither is this).
    QuerySpec("q16_order_age",
      (s, dir) =>
        t(s, dir, "orders").select(col("o_orderkey"),
          Scalars.age(to_date(col("o_orderdate")), 2026).as("age"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(2026 - year(CAST(o_orderdate AS DATE)) AS INTEGER) AS age
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // q17 — F5 time formatting to canonical 'HH:mm:ss'.
    QuerySpec("q17_time_format",
      (s, dir) =>
        t(s, dir, "events").select(col("event_id"),
          date_format(col("ts"), "HH:mm:ss").as("t")).orderBy("event_id"),
      Some("""SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') AS t
             |FROM events ORDER BY event_id""".stripMargin)),

    // q18 — F9 relative race-time resolution (`time_etl.py:11-27`): build
    // a '+ss.ff' gap or absolute 'HH:mm:ss' string from event data, then
    // resolve both branches to canonical 'HH:mm:ss.SSS'.
    QuerySpec("q18_race_time_gap",
      (s, dir) => {
        val raw = when(col("value") >= 100, date_format(col("ts"), "HH:mm:ss"))
          .otherwise(concat(lit("+"), format_string("%.2f", col("value"))))
        t(s, dir, "events")
          .select(col("event_id"), raw.as("raw_time"),
            Scalars.resolveRaceTime(raw).as("abs_time"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, raw_time,
             | CASE WHEN raw_time LIKE '+%'
             |   THEN strftime(make_timestamp(CAST(round(CAST(substr(raw_time, 2) AS DOUBLE) * 1000) AS BIGINT) * 1000), '%H:%M:%S.%g')
             |   ELSE strftime(strptime(raw_time, '%H:%M:%S'), '%H:%M:%S.%g') END AS abs_time
             |FROM (SELECT event_id,
             |  CASE WHEN value >= 100 THEN strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S')
             |       ELSE '+' || printf('%.2f', value) END AS raw_time
             |  FROM events) ORDER BY event_id""".stripMargin)),

    // q19 — F11/F12 permissive cast + sentinel→0 default
    // (`quali_etl.py:57`, `results_etl.py:46`).
    QuerySpec("q19_cast_default",
      (s, dir) =>
        // Non-ANSI cast (configure() pins ansi off) returns NULL on junk
        // WITHOUT raising: try_cast's TryEval catches a Java exception per
        // failing row — ~4× slower here where most rows fail the parse.
        t(s, dir, "orders").select(col("o_orderkey"),
          coalesce(split_part(col("o_orderpriority"), lit("-"), lit(1)).cast("int"), lit(0)).as("pri"),
          coalesce(col("o_orderstatus").cast("int"), lit(0)).as("status_num"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             | coalesce(TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER), 0) AS pri,
             | coalesce(TRY_CAST(o_orderstatus AS INTEGER), 0) AS status_num
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // q20 — JSON extraction from events.props (extension scalar, SURVEY
    // §2.8 footnote).
    QuerySpec("q20_json_extract",
      (s, dir) =>
        // sort-below-heavy-projection: keeps JSON parsing out of the
        // range-sampling pass (NOTES.md)
        t(s, dir, "events").select("event_id", "props")
          .orderBy("event_id")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // q21 — grouping-set rollup over the star join (engine surface beyond
    // the reference's flat GROUP BY — SURVEY §2.5 footnote). Flat-aggregate
    // FIRST, rollup over the 25-row result: Spark's Expand duplicates every
    // input row per grouping set before the partial agg, so rolling up the
    // raw rows triples the agg input; rolling up decimal partials is exact
    // (associativity) and the Expand touches only |groups| rows.
    QuerySpec("q21_rollup_revenue",
      (s, dir) =>
        starOrderGrain(s, dir).groupBy("r_name", "n_name")
          .agg(sum(col("rev_dec")).as("g_rev"), sum(col("n_part")).as("g_n"))
          .rollup(col("r_name"), col("n_name"))
          .agg(sum(col("g_rev")).cast("double").as("revenue"),
            sum(col("g_n")).as("n_items"))
          .persistTracked()
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first),
      Some("""SELECT r_name, n_name,
             | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             | count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)),

    // q22 — distinct-count aggregate per group.
    QuerySpec("q22_distinct_parts",
      (s, dir) =>
        t(s, dir, "lineitem").groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q23 — tumbling event-time window aggregation (batch form of the
    // streaming surface, SURVEY §2.9; oracle = date_trunc buckets).
    QuerySpec("q23_events_hourly",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"),
            Stable.dsum(col("value"), 2).as("sum_value"))
          // timestamp_ntz: window.start is a (UTC-adjusted) TimestampType;
          // DuckDB's date_trunc yields a naive timestamp — write naive.
          .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
            col("n_events"), col("sum_value"))
          .orderBy("hour_start"),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             | count(*) AS n_events,
             | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q70 — unpivot/melt (wide → long), the inverse of q51's pivot and a
    // staple of training-data prep (per-measure rows for feature
    // pipelines). Native Dataset.unpivot: a local generator — each input
    // row expands to one row per measure with zero shuffle; the only
    // exchange in the plan is the final sort. Measures are cast to one
    // common type up front (long schemas must be homogeneous).
    QuerySpec("q70_unpivot",
      (s, dir) =>
        t(s, dir, "part")
          .unpivot(
            Array(col("p_partkey")),
            Array(col("p_size").cast("double").as("p_size"),
              col("p_retailprice")),
            "measure", "val")
          .orderBy("p_partkey", "measure"),
      Some("""SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val
             |FROM part
             |UNION ALL
             |SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS val
             |FROM part
             |ORDER BY p_partkey, measure""".stripMargin)),

    // q77 — the SQL entry path: temp views + one ANSI SQL string that runs
    // UNCHANGED on both engines (Spark's parser/Catalyst and DuckDB get
    // the identical text — the literal portability claim of the SQL
    // surface, S6/A3). Same optimizations as the DataFrame path: one
    // logical plan, broadcast dim join, partial+final agg.
    QuerySpec("q77_sql_api",
      (s, dir) => {
        Seq("customer", "orders").foreach(t =>
          Tables.load(s, dir, t).createOrReplaceTempView(t))
        s.sql(portableSql)
      },
      Some(portableSql)),

    // q87 — subquery surface of the SQL entry path: correlated EXISTS /
    // NOT EXISTS and a correlated scalar subquery, one text verbatim on
    // both engines (same contract as q77). Catalyst decorrelates all
    // three into distributed joins — EXISTS → left-semi, NOT EXISTS →
    // left-anti, scalar count → aggregate + left-outer — so the
    // row-at-a-time subquery *syntax* costs one keyed shuffle each, not
    // one probe per customer row (the reference's per-row existence
    // check, `__pycache__/q.cpython-38.pyc`, done set-oriented).
    QuerySpec("q87_sql_subqueries",
      (s, dir) => {
        Seq("customer", "orders").foreach(t =>
          Tables.load(s, dir, t).createOrReplaceTempView(t))
        s.sql(subquerySql)
      },
      Some(subquerySql)),

    // q38 — set operators (INTERSECT / EXCEPT): customers ordering in
    // 1997 vs 1998. Spark plans both as joins — same shuffle shape as J2/J3.
    QuerySpec("q38_set_ops",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def keys(y: Int) = o.filter(year(col("o_orderdate")) === y)
          .select("o_custkey").distinct()
        val both   = keys(1997).intersect(keys(1998)).withColumn("tag", lit("both"))
        val only97 = keys(1997).except(keys(1998)).withColumn("tag", lit("only_1997"))
        both.union(only97).select("tag", "o_custkey").orderBy("tag", "o_custkey")
      },
      Some("""SELECT 'both' AS tag, o_custkey FROM (
             |  SELECT DISTINCT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
             |  INTERSECT
             |  SELECT DISTINCT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1998)
             |UNION ALL
             |SELECT 'only_1997' AS tag, o_custkey FROM (
             |  SELECT DISTINCT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997
             |  EXCEPT
             |  SELECT DISTINCT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1998)
             |ORDER BY tag, o_custkey""".stripMargin)),

    // q39 — CUBE grouping sets over two independent dimensions. Same
    // flat-aggregate-then-cube shape as q21: the Expand runs over the
    // ~20-row flat result instead of 4× the joined fact rows.
    QuerySpec("q39_cube_revenue",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority", "l_returnflag")
          .agg(Stable.dsumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("g_rev"), count(lit(1)).as("g_n"))
          .cube(col("o_orderpriority"), col("l_returnflag"))
          .agg(sum(col("g_rev")).cast("double").as("revenue"),
            sum(col("g_n")).as("n_items"))
          .persistTracked()
          .orderBy(col("o_orderpriority").asc_nulls_first,
            col("l_returnflag").asc_nulls_first),
      Some("""SELECT o_orderpriority, l_returnflag,
             | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             | count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY CUBE (o_orderpriority, l_returnflag)
             |ORDER BY o_orderpriority NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin)),

    // q43 — exact percentiles per group via distributed rank selection
    // (ops.Quantiles ≡ DuckDB `quantile_cont`: identical interpolation
    // arithmetic, but value-grain PrefixSum ranks instead of Spark's
    // `percentile` aggregate, whose per-group value buffer is a per-task
    // OOM on a continuous column at 100 TB). Round guards the last
    // interpolation bit.
    QuerySpec("q43_percentiles",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = graft.ops.Quantiles.quantileCont(li, Seq("l_returnflag"),
          "l_quantity", Seq("p50_qty" -> 0.5), countCol = Some("n"))
        val b = graft.ops.Quantiles.quantileCont(li, Seq("l_returnflag"),
          "l_extendedprice", Seq("p90_price" -> 0.9))
        a.join(b, "l_returnflag")
          .select(col("l_returnflag"),
            round(col("p50_qty"), 6).as("p50_qty"),
            round(col("p90_price"), 6).as("p90_price"), col("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             | round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
             | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
             | count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q49 — the BI-layer flagship (SURVEY §2.5 A3 + §2.6): standings-style
    // "top 3 customers per region by revenue" — star join → pre-aggregate
    // → ranking window → filter. Aggregation happens BEFORE the window, so
    // the rank shuffle carries one row per (region, customer), not per
    // lineitem.
    QuerySpec("q49_region_top_customers",
      (s, dir) => {
        val rev = starOrderGrain(s, dir).groupBy("r_name", "c_custkey", "c_name")
          .agg(revFinal.as("revenue"))
        val w = Window.partitionBy("r_name")
          .orderBy(col("revenue").desc, col("c_custkey"))
        rev.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
          .select("r_name", "rnk", "c_custkey", "c_name", "revenue")
          .orderBy("r_name", "rnk")
      },
      Some("""SELECT r_name, rnk, c_custkey, c_name, revenue FROM (
             |  SELECT r_name, c_custkey, c_name, revenue,
             |    CAST(row_number() OVER (PARTITION BY r_name ORDER BY revenue DESC, c_custkey) AS INTEGER) AS rnk
             |  FROM (
             |    SELECT r_name, c_custkey, c_name,
             |      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |    FROM lineitem
             |    JOIN orders ON l_orderkey = o_orderkey
             |    JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey
             |    JOIN region ON n_regionkey = r_regionkey
             |    GROUP BY r_name, c_custkey, c_name))
             |WHERE rnk <= 3 ORDER BY r_name, rnk""".stripMargin)),

    // q51 — pivot: linestatus values become revenue columns (conditional
    // aggregation under the hood; explicit value list avoids the extra
    // distinct-values job at scale).
    QuerySpec("q51_pivot_revenue",
      (s, dir) =>
        t(s, dir, "lineitem").groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(revenue)
          .withColumnRenamed("F", "rev_F").withColumnRenamed("O", "rev_O")
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_F,
             | CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_O
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q53 — explicit GROUPING SETS through the SQL front-end (spark.sql is
    // engine surface too; the DataFrame API covers rollup/cube in q21/q39).
    QuerySpec("q53_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
        t(s, dir, "orders").createOrReplaceTempView("ord_gs")
        s.sql("""SELECT o_orderpriority, l_returnflag,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                |  count(*) AS n
                |FROM li_gs JOIN ord_gs ON l_orderkey = o_orderkey
                |GROUP BY GROUPING SETS ((o_orderpriority), (l_returnflag))
                |ORDER BY o_orderpriority ASC NULLS FIRST, l_returnflag ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderpriority, l_returnflag,
             | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             | count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY GROUPING SETS ((o_orderpriority), (l_returnflag))
             |ORDER BY o_orderpriority ASC NULLS FIRST, l_returnflag ASC NULLS FIRST""".stripMargin)),

    // q54 — set-oriented upsert guard (SURVEY §2.4 J3: the deleted per-row
    // existence probe): batch left-anti existing → union. At scale this is
    // one shuffle on the key — the idempotent-ingest pattern replacing the
    // reference's cross-run dedup bug (D4).
    QuerySpec("q54_upsert_guard",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val existing = ev.filter(col("event_id") % 10 =!= 0)
        val batch = ev.filter(col("event_id") % 2 === 0)
        val toInsert = batch.join(existing.select("event_id"), Seq("event_id"), "left_anti")
        existing.unionByName(toInsert)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""WITH existing AS (SELECT * FROM events WHERE event_id % 10 <> 0),
             |batch AS (SELECT * FROM events WHERE event_id % 2 = 0),
             |ins AS (SELECT * FROM batch WHERE event_id NOT IN (SELECT event_id FROM existing))
             |SELECT event_type, count(*) AS n
             |FROM (SELECT * FROM existing UNION ALL SELECT * FROM ins)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q66 — approximate percentiles via a fixed-width HISTOGRAM sketch:
    // the scale path for q43's exact form — exact percentile needs a
    // per-group full sort; the sketch is one pass into bounded mergeable
    // state (bin counts; bin = floor(price/100), value error ≤ the bin
    // width), the shape that survives 100 TB. Unlike Spark's built-in
    // approx_percentile (Greenwald-Khanna, engine-specific internals)
    // every step here is deterministic integer arithmetic — bin counts,
    // cumulative ranks, the 2·cum ≥ n crossing rule — so the estimate is
    // bit-reproducible in the generated DuckDB oracle (VERDICT r8 #3).
    // The per-group window runs over BIN grain (~1k bins/group, bounded
    // by the value range), never row grain.
    QuerySpec("q66_approx_percentile",
      (s, dir) => {
        val bins = t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            floor(col("l_extendedprice") / lit(100.0d)).cast("long").as("bin"))
          .groupBy("l_returnflag", "bin")
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("l_returnflag").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("l_returnflag")
        bins
          .withColumn("cum", sum(col("c")).over(w))
          .withColumn("n", sum(col("c")).over(wAll))
          .groupBy("l_returnflag")
          .agg(
            (min(when(col("cum") * 2 >= col("n"), col("bin"))) * 100 + 50)
              .cast("double").as("p50_approx"),
            (min(when(col("cum") * 10 >= col("n") * 9, col("bin"))) * 100 + 50)
              .cast("double").as("p90_approx"),
            max(col("n")).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""WITH b AS (SELECT l_returnflag,
             |    CAST(floor(l_extendedprice / CAST(100 AS DOUBLE)) AS BIGINT) AS bin,
             |    count(*) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT l_returnflag, bin, c,
             |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
             |  FROM b)
             |SELECT l_returnflag,
             |  CAST(MIN(CASE WHEN cum * 2 >= n THEN bin END) * 100 + 50 AS DOUBLE)
             |    AS p50_approx,
             |  CAST(MIN(CASE WHEN cum * 10 >= n * 9 THEN bin END) * 100 + 50 AS DOUBLE)
             |    AS p90_approx,
             |  CAST(MAX(n) AS BIGINT) AS n
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // q65 — MULTISET set operators + full-outer join: exceptAll /
    // intersectAll keep duplicate multiplicity (q38 covers the distinct
    // forms), and the per-key tallies of the two results meet in a
    // full-outer join (the remaining join family; inner=J1, left_anti=q08,
    // left_semi=q09). Both engines implement the multiset semantics as a
    // count-and-replicate aggregation — one shuffle per side.
    QuerySpec("q65_multiset_ops",
      (s, dir) => {
        def side(flag: String) = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === flag)
          .select((col("l_orderkey") % 100).as("k"))
        val a = side("A"); val b = side("R")
        val onlyA = a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n_only_a"))
        val both = a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n_both"))
        onlyA.join(both, Seq("k"), "full_outer")
          .na.fill(0L, Seq("n_only_a", "n_both"))
          .orderBy("k")
      },
      Some("""WITH a AS (SELECT l_orderkey % 100 AS k FROM lineitem WHERE l_returnflag = 'A'),
             |b AS (SELECT l_orderkey % 100 AS k FROM lineitem WHERE l_returnflag = 'R'),
             |ex AS (SELECT k, count(*) AS n_only_a
             |       FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY k),
             |i AS (SELECT k, count(*) AS n_both
             |      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY k)
             |SELECT coalesce(ex.k, i.k) AS k,
             |  coalesce(n_only_a, 0) AS n_only_a, coalesce(n_both, 0) AS n_both
             |FROM ex FULL OUTER JOIN i ON ex.k = i.k ORDER BY k""".stripMargin)),

    // q58 — window FRAME specs (SURVEY §2.6: rowsBetween + lag): per-
    // customer 3-order moving average and inter-order gap. The moving
    // average is frame-sum / frame-count over DECIMAL, not avg(double):
    // DuckDB evaluates sliding SUM with a segment tree (different
    // association order than Spark's running fold), so double sums drift —
    // decimal sums are associative (NOTES rule 1). One shuffle on
    // o_custkey serves both windows (same partitioning + ordering).
    QuerySpec("q58_moving_avg",
      (s, dir) => {
        val byCust = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val frame = byCust.rowsBetween(-2, 0)
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).over(frame).cast("double") /
              count(lit(1)).over(frame), 4).as("mov_avg3"),
            datediff(to_date(col("o_orderdate")),
              to_date(lag(col("o_orderdate"), 1).over(byCust))).as("gap_days"))
          // persist so the final sort's sampling pass reads the window
          // output instead of re-running both window passes
          .persistTracked()
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             | round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER frame AS DOUBLE)
             |   / (COUNT(*) OVER frame), 4) AS mov_avg3,
             | CAST(date_diff('day', CAST(lag(o_orderdate, 1) OVER bycust AS DATE),
             |   CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
             |FROM orders
             |WINDOW frame AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             |  bycust AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // q98 — SCD Type-2 dimension build: collapse each customer's order
    // priority history into validity intervals — change detection (value
    // differs from its lag) keeps one row per version, then valid_to =
    // the next version's valid_from and the open interval is current.
    // The warehouse surface the reference's star schema implies but its
    // per-row loader could never express: as one declarative lineage
    // both windows share a single (custkey) shuffle partitioning, so the
    // whole history rebuild is ONE exchange at any scale — and the
    // as-of-join query (q36) is the read side of the same table shape.
    QuerySpec("q98_scd2",
      (s, dir) => {
        val byCust = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val changes = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"),
            lag(col("o_orderpriority"), 1).over(byCust).as("prev"))
          .filter(col("prev").isNull || col("o_orderpriority") =!= col("prev"))
        changes
          .select(col("o_custkey"), col("o_orderpriority"),
            col("o_orderdate").as("valid_from"),
            lead(col("o_orderdate"), 1).over(byCust).as("valid_to"),
            row_number().over(byCust).as("version"))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("o_custkey", "version")
      },
      Some("""WITH c AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             |    lag(o_orderpriority, 1) OVER bycust AS prev
             |  FROM orders
             |  WINDOW bycust AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |v AS (
             |  SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
             |    lead(o_orderdate, 1) OVER w AS valid_to,
             |    CAST(row_number() OVER w AS INTEGER) AS version
             |  FROM c WHERE prev IS NULL OR o_orderpriority <> prev
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
             |SELECT o_custkey, o_orderpriority, valid_from, valid_to, version,
             |  valid_to IS NULL AS is_current
             |FROM v ORDER BY o_custkey, version""".stripMargin)),

    // q99 — snapshot diff: classify every key across two pipeline-run
    // versions of a table as added / removed / changed / unchanged — the
    // data-regression check that runs between ingest runs before a new
    // snapshot is published. One full-outer join on the key (single
    // shuffle both sides at any scale; AQE handles skewed keys), change
    // detection compares the payload columns. The two versions are
    // simulated deterministically from `orders` (keys % 50 = 0 absent
    // from the old run, % 97 = 0 absent from the new one, % 70 = 0
    // repriced — so all four classes occur).
    QuerySpec("q99_snapshot_diff",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val old = base.filter(col("o_orderkey") % 50 =!= 0)
          .withColumnRenamed("o_totalprice", "old_price")
        val neu = base.filter(col("o_orderkey") % 97 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 70 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("new_price"))
        old.join(neu, Seq("o_orderkey"), "full_outer")
          .select(when(col("old_price").isNull, "added")
            .when(col("new_price").isNull, "removed")
            .when(col("old_price") =!= col("new_price"), "changed")
            .otherwise("unchanged").as("change_type"))
          .groupBy("change_type").agg(count(lit(1)).as("n"))
          .orderBy("change_type")
      },
      Some("""WITH old AS (SELECT o_orderkey, o_totalprice AS old_price
             |  FROM orders WHERE o_orderkey % 50 <> 0),
             |neu AS (SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 70 = 0 THEN o_totalprice * 2
             |         ELSE o_totalprice END AS new_price
             |  FROM orders WHERE o_orderkey % 97 <> 0),
             |d AS (SELECT CASE
             |    WHEN old_price IS NULL THEN 'added'
             |    WHEN new_price IS NULL THEN 'removed'
             |    WHEN old_price <> new_price THEN 'changed'
             |    ELSE 'unchanged' END AS change_type
             |  FROM old FULL OUTER JOIN neu USING (o_orderkey))
             |SELECT change_type, count(*) AS n FROM d
             |GROUP BY change_type ORDER BY change_type""".stripMargin)),

    // q136 — TPC-H Q3 shape (shipping-priority): the classic
    // filter-heavy 3-way fact join with a top-k by aggregated revenue.
    // Both date predicates and the segment filter push into their
    // parquet scans BEFORE the joins; the aggregate runs at order grain;
    // the top-10 is a TakeOrdered, not a global sort. Revenue goes
    // through the shared DECIMAL(18,4) stabilization so the sum is
    // summation-order-independent (Stable.dsum — the q07 rule).
    // l_orderkey added to the reference ordering as a determinism
    // tie-break.
    QuerySpec("q136_tpch_q3",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1995-09-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1995-09-01").cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(revenue.as("revenue"))
          .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
            col("o_orderpriority"))
          .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  o_orderdate, o_orderpriority
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-09-01'
             |  AND l_shipdate > TIMESTAMP '1995-09-01'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, o_orderdate, l_orderkey
             |LIMIT 10""".stripMargin)),

    // q137 — TPC-H Q5 shape (local-supplier volume): the 6-way join
    // whose twist is the NON-FK equality c_nationkey = s_nationkey
    // (customer and supplier must share a nation). nation/region are
    // broadcast (tiny dims); the three fact-side joins shuffle on their
    // keys; the year window prunes the orders scan. Same decimal-stable
    // revenue; n_name tiebreak for determinism.
    QuerySpec("q137_tpch_q5",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(revenue.as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // q154 — TPC-H Q10 shape (returned-item reporting): quarter-windowed
    // orders joined to 'R'-flagged lineitems, revenue re-aggregated at
    // customer grain with the nation dim broadcast, top-20 by lost
    // revenue. Both filters push into their parquet scans below the
    // joins; the top-20 is a TakeOrdered. Same decimal-stable revenue as
    // q136/q137; c_custkey tiebreak for determinism.
    QuerySpec("q154_tpch_q10",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(revenue.as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey
             |LIMIT 20""".stripMargin)),

    // q155 — TPC-H Q18 shape (large-volume customers): the HAVING-
    // subquery form restated as agg-below-join — sum(l_quantity) runs
    // ONCE at order grain before any join (map-side combine collapses
    // the fact table to order-grain rows), the >300 screen prunes to a
    // tiny survivor set, and orders/customer join onto survivors. At
    // 100 TB that ordering is the difference between shuffling lineitem
    // once at order grain and joining the raw fact twice (the reference
    // HAVING form re-scans). Quantity sums are decimal-stabilized; the
    // reference's o_totalprice desc, o_orderdate ordering gets an
    // o_orderkey tiebreak.
    QuerySpec("q155_tpch_q18",
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(Stable.dsum(col("l_quantity"), 2).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer").select("c_custkey", "c_name"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300)
             |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
             |FROM big
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
             |LIMIT 100""".stripMargin)),

    // q161 — TPC-H Q4 shape (order-priority checking): EXISTS restated
    // as a LEFT SEMI join. The probe side is projected to l_orderkey
    // only and partial-aggregates map-side inside the semi join (Spark
    // dedups build keys), so the shuffle carries key-only rows; the
    // quarter window prunes the orders scan. The semi join — not
    // `IN (collect)` and not an inner-join + distinct — is the
    // at-scale form: no fact-side row multiplication, no driver set.
    // (Q4's l_commitdate < l_receiptdate predicate has no corpus
    // column; l_returnflag = 'R' stands in as the line-level screen.)
    QuerySpec("q161_tpch_q4",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_orderpriority")
        val flagged = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey")
        ord.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_returnflag = 'R')
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // q162 — TPC-H Q12 shape (shipping-mode priority split): the
    // conditional-aggregation form — CASE inside SUM, one pass, no
    // self-join per priority class. The year window pushes into the
    // lineitem scan; the join shuffles at lineitem grain on orderkey
    // (only orderkey+priority projected from orders). l_linestatus
    // stands in for the absent l_shipmode.
    QuerySpec("q162_tpch_q12",
      (s, dir) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linestatus")
        li.join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    // q163 — TPC-H Q16 shape (parts/supplier relationship): NOT IN
    // restated as a LEFT ANTI join, plus COUNT(DISTINCT) over a
    // pre-distincted bridge. lineitem's (partkey, suppkey) pairs are
    // distincted FIRST (map-side combine collapses the ~4× line
    // multiplicity before any join); the excluded-supplier set
    // (negative balance, standing in for Q16's complaints LIKE) is
    // key-only and broadcast; the part screen prunes below the join.
    QuerySpec("q163_tpch_q16",
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val excl = t(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        val pt = t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#23" && col("p_size") <= 25)
          .select("p_partkey", "p_brand", "p_type", "p_size")
        ps.join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(pt, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#23' AND p_size <= 25
             |  AND l_suppkey NOT IN
             |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // q164 — TPC-H Q17 shape (small-quantity-order revenue): the
    // correlated AVG subquery decorrelated into a part-grain pre-agg
    // joined back to the brand-filtered lines — the fact table is
    // scanned once, pre-filtered by the broadcast part screen, and the
    // avg join is at part grain. Parity: avg = CAST(decimal SUM AS
    // DOUBLE)/count, then one IEEE multiply by 0.2 — bit-identical in
    // both engines, so the < comparison can't flip at boundaries
    // (q86/q147 rule).
    QuerySpec("q164_tpch_q17",
      (s, dir) => {
        val br = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        val liB = t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(br), col("l_partkey") === col("p_partkey"))
          .persistTracked()
        val avgq = liB.groupBy("l_partkey")
          .agg((sum(col("l_quantity")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double") / count(lit(1))).as("avg_qty"))
        liB.join(avgq, "l_partkey")
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(round(Stable.dsum(col("l_extendedprice"), 4) / lit(7.0), 4)
            .as("avg_yearly"))
      },
      Some("""WITH liB AS (
             |  SELECT l_partkey, l_quantity, l_extendedprice
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#23'),
             |a AS (
             |  SELECT l_partkey,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |      / count(*) AS avg_qty
             |  FROM liB GROUP BY l_partkey)
             |SELECT round(
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             |      / 7.0, 4) AS avg_yearly
             |FROM liB JOIN a USING (l_partkey)
             |WHERE l_quantity < 0.2 * avg_qty""".stripMargin)),

    // q165 — TPC-H Q22 shape (global-customer sales opportunity): a
    // scalar aggregate subquery (avg positive balance) as a 1-row
    // broadcast cross join — corpus-size-independent — and NOT EXISTS
    // (orders) as a LEFT ANTI join on the key-only probe. The avg is
    // decimal-sum/count like q164 so the > screen is boundary-exact.
    QuerySpec("q165_tpch_q22",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val avgBal = cust.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("c_acctbal")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double") / count(lit(1))).as("avg_bal"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(t(s, dir, "orders").select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal")
                .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH a AS (
             |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |      / count(*) AS avg_bal
             |  FROM customer WHERE c_acctbal > 0.0)
             |SELECT c_nationkey, count(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |    AS totacctbal
             |FROM customer, a
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey)
             |GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    // q170 — TPC-H Q6 shape (forecasting-revenue change): the pure
    // predicate-pushdown query — every filter (date window, discount
    // band, quantity cap) reaches the parquet scan as a PushedFilter,
    // the scan projects two columns, and the aggregate is a map-side
    // partial + 1-row final. At 100 TB this query's cost is the scan's
    // row-group skipping, nothing else — there is no shuffle of data
    // rows at all.
    QuerySpec("q170_tpch_q6",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(Stable.dsum(col("l_extendedprice") * col("l_discount"), 6), 4)
          .as("revenue")),
      Some("""SELECT round(
             |  CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DOUBLE),
             |  4) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // q171 — TPC-H Q7 shape (volume shipping between two nations): the
    // double-dimension-constrained join — the supplier side and the
    // customer side each resolve to a nation name, and the pair filter
    // ((A,B) or (B,A)) runs where both are first available. nation is
    // broadcast twice under different aliases; the fact-side joins
    // shuffle at lineitem then order grain; the year split comes from
    // l_shipdate.
    QuerySpec("q171_tpch_q7",
      (s, dir) => {
        val n1 = t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val pairOk = (col("supp_nation") === "NATION_3" &&
            col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" &&
            col("cust_nation") === "NATION_3")
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(pairOk)
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(revenue.as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
             |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // q172 — TPC-H Q8 shape (national market share): conditional share
    // of a conditional aggregate — numerator and denominator are the
    // SAME decimal sum split by a CASE on the supplier's nation, so one
    // pass computes both (no self-join, no second scan). The region
    // screen rides the broadcast customer-side nation; the part type
    // screen prunes the part join's build side.
    QuerySpec("q172_tpch_q8",
      (s, dir) => {
        val volDec = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))
        val natR = broadcast(t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nk")))
        val nS = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        t(s, dir, "lineitem")
          .join(t(s, dir, "part").filter(col("p_type") === "STANDARD")
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(natR, col("c_nationkey") === col("c_nk"))
          .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(nS, col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_5", volDec)
              .otherwise(lit(0).cast(
                org.apache.spark.sql.types.DecimalType(18, 4)))).cast("double") /
            sum(volDec).cast("double"), 6).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  round(
             |    CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
             |      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
             |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE),
             |    6) AS mkt_share
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY year(o_orderdate)
             |ORDER BY o_year""".stripMargin)),

    // q173 — TPC-H Q13 shape (customer order-count distribution): the
    // distribution-of-an-aggregate — LEFT OUTER join so zero-order
    // customers keep c_count = 0, then a second aggregation over the
    // first's results. The outer join shuffles at order grain once; the
    // second groupBy touches |customers| rows. (Q13's comment NOT LIKE
    // screen has no corpus column; o_orderpriority <> '5-LOW' stands
    // in.)
    QuerySpec("q173_tpch_q13",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey")
        t(s, dir, "customer").select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer
             |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
             |    AND o_orderpriority <> '5-LOW'
             |  GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // q174 — TPC-H Q14 shape (promotion effect): percentage-of-total as
    // a CASE split inside one aggregate pass over the month window —
    // numerator and denominator share the scan and the join, and the
    // part side carries only (p_partkey, p_type).
    QuerySpec("q174_tpch_q14",
      (s, dir) => {
        val volDec = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(t(s, dir, "part").select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", volDec)
              .otherwise(lit(0).cast(
                org.apache.spark.sql.types.DecimalType(18, 4)))).cast("double") /
            sum(volDec).cast("double"), 6).as("promo_revenue"))
      },
      Some("""SELECT round(100.0 *
             |    CAST(SUM(CASE WHEN p_type = 'PROMO'
             |      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
             |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE),
             |    6) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
             |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)),

    // q175 — TPC-H Q15 shape (top supplier): max-of-an-aggregate
    // self-comparison — supplier revenue aggregates once (persisted:
    // referenced by both the max and the final filter), the 1-row max
    // broadcasts back, and equality selects the winner(s). The decimal
    // sums make the equality exact — no epsilon needed. Replaces Q15's
    // view with the same two-reference dataflow.
    QuerySpec("q175_tpch_q15",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(revenue.as("total_revenue"))
          .persistTracked()
        val mx = rev.agg(max(col("total_revenue")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_revenue") === col("mx"))
          .join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // q176 — TPC-H Q2 shape (minimum-cost supplier): the correlated
    // MIN subquery as a per-part struct-MIN argmin — one aggregate
    // whose partial combines map-side, instead of Q2's re-scan of the
    // supplier bridge inside the subquery. The struct carries
    // (s_acctbal, s_suppkey, names...) so the argmin's payload rides
    // the same aggregate; (acctbal, suppkey) is unique, so the carried
    // names are deterministic. Region screen broadcasts; the bridge is
    // distincted (partkey, suppkey) before any join.
    QuerySpec("q176_tpch_q2",
      (s, dir) => {
        val pt = t(s, dir, "part")
          .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
          .select("p_partkey")
        val supEu = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")
            .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_acctbal", "s_name", "n_name")
        t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(pt, col("l_partkey") === col("p_partkey"))
          .join(supEu, col("l_suppkey") === col("s_suppkey"))
          .groupBy("p_partkey")
          .agg(min(struct(col("s_acctbal"), col("s_suppkey"),
            col("s_name"), col("n_name"))).as("m"))
          .select(col("m.s_acctbal").as("s_acctbal"), col("m.s_name").as("s_name"),
            col("m.n_name").as("n_name"), col("p_partkey"))
          .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |cand AS (
             |  SELECT p_partkey, s_acctbal, s_name, n_name,
             |    row_number() OVER (PARTITION BY p_partkey
             |      ORDER BY s_acctbal, s_suppkey) AS rn
             |  FROM bridge
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE')
             |SELECT s_acctbal, s_name, n_name, p_partkey
             |FROM cand WHERE rn = 1
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // q177 — TPC-H Q9 shape (product-type profit): multi-fact profit
    // expression computed per row BEFORE aggregation (one IEEE
    // expression in both engines, then a decimal-stable sum), grouped
    // by supplier nation × order year. The part screen (name contains)
    // cannot push as a parquet stat filter but prunes the join's build
    // side; supply cost is proxied as 0.6·p_retailprice·l_quantity
    // (the corpus has no partsupp).
    QuerySpec("q177_tpch_q9",
      (s, dir) => {
        val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")
        t(s, dir, "lineitem")
          .join(t(s, dir, "part").filter(col("p_name").contains("red"))
            .select("p_partkey", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(Stable.dsum(amount, 4).as("sum_profit"))
          .orderBy(col("nation"), desc("o_year"))
      },
      Some("""SELECT n_name AS nation,
             |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount)
             |    - 0.6*p_retailprice*l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             |    AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |WHERE p_name LIKE '%red%'
             |GROUP BY n_name, year(o_orderdate)
             |ORDER BY nation, o_year DESC""".stripMargin)),

    // q178 — TPC-H Q11 shape (important stock identification): a
    // grouped value screened against a fraction of the SAME value's
    // grand total — the scalar subquery is the group frame re-aggregated
    // to one row and broadcast back (no second scan of the bridge). The
    // nation screen broadcasts into the bridge join; value is proxied
    // as p_retailprice over distinct (part, supplier) pairs.
    QuerySpec("q178_tpch_q11",
      (s, dir) => {
        val supN = broadcast(t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_7").select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey"))
        val vals = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(supN, col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "part").select("p_partkey", "p_brand", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(Stable.dsum(col("p_retailprice"), 2).as("value"))
          .persistTracked()
        val tot = vals.agg((sum(col("value").cast(
            org.apache.spark.sql.types.DecimalType(18, 2))).cast("double") *
          lit(0.05)).as("threshold"))
        vals.crossJoin(broadcast(tot))
          .filter(col("value") > col("threshold"))
          .select(col("p_brand"), col("value"))
          .orderBy(desc("value"), col("p_brand"))
      },
      Some("""WITH vals AS (
             |  SELECT p_brand,
             |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS value
             |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN part ON l_partkey = p_partkey
             |  WHERE n_name = 'NATION_7'
             |  GROUP BY p_brand)
             |SELECT p_brand, value FROM vals
             |WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 0.05
             |               FROM vals)
             |ORDER BY value DESC, p_brand""".stripMargin)),

    // q179 — TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three
    // conjunctive branches over BOTH sides of the join, OR'd — the
    // optimizer can push only the per-side envelope (size ≤ 15,
    // quantity ≤ 30) to the scans; the disjunction itself must run
    // post-join. One pass, one row out.
    QuerySpec("q179_tpch_q19",
      (s, dir) => {
        val branch = (col("p_brand") === "Brand#1" &&
            col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" &&
            col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" &&
            col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
        t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(t(s, dir, "part").select("p_partkey", "p_brand", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .filter(branch)
          .agg(round(revenue, 4).as("revenue"))
      },
      Some("""SELECT round(
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE),
             |  4) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // q180 — TPC-H Q20 shape (potential part promotion): the nested
    // IN-chain as aggregates + semi joins — shipped quantity per
    // (supplier, part) in the year aggregates once at that grain, the
    // >100 screen (standing in for 0.5·availqty; no partsupp) keeps
    // qualifying pairs, the part-name screen prunes them, and the
    // surviving supplier keys semi-join suppliers. No correlated
    // re-scans — each input is read once.
    QuerySpec("q180_tpch_q20",
      (s, dir) => {
        val qty96 = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(Stable.dsum(col("l_quantity"), 2).as("qty"))
        val cand = qty96
          .join(t(s, dir, "part").filter(col("p_name").startsWith("small"))
            .select("p_partkey"), col("l_partkey") === col("p_partkey"))
          .filter(col("qty") > 100)
          .select("l_suppkey")
        t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_3").select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"))
          .join(cand, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "s_acctbal")
          .orderBy("s_name")
      },
      Some("""SELECT s_name, s_acctbal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_3'
             |  AND s_suppkey IN (
             |    SELECT l_suppkey
             |    FROM lineitem JOIN part ON l_partkey = p_partkey
             |    WHERE p_name LIKE 'small%'
             |      AND l_shipdate >= TIMESTAMP '1996-01-01'
             |      AND l_shipdate < TIMESTAMP '1997-01-01'
             |    GROUP BY l_partkey, l_suppkey
             |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 100)
             |ORDER BY s_name""".stripMargin)),

    // q181 — TPC-H Q21 shape (suppliers who kept orders waiting):
    // Q21's EXISTS/NOT-EXISTS pair over other lineitems of the same
    // order restated as ONE order-grain aggregate — n_suppliers and
    // n_failing_suppliers (distinct counts, the failing one
    // null-screened through CASE) — so the fact table is scanned once
    // instead of three times. A supplier waits an order if: the order
    // is 'F', he failed in it, it has another supplier, and no OTHER
    // supplier failed (ns > 1 AND nf = 1). l_returnflag = 'R' stands in
    // for the missing l_receiptdate > l_commitdate.
    QuerySpec("q181_tpch_q21",
      (s, dir) => {
        val liO = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(countDistinct(col("l_suppkey")).as("ns"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("nf"))
          .filter(col("ns") > 1 && col("nf") === 1)
          .select("l_orderkey")
        val fails = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("f_orderkey"), col("l_suppkey"))
          .distinct()
        fails
          .join(liO, col("f_orderkey") === col("l_orderkey"), "left_semi")
          .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select("o_orderkey"), col("f_orderkey") === col("o_orderkey"),
            "left_semi")
          .join(t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")
            .filter(col("n_name") === "NATION_1").select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), col("s_name"))
          .limit(20)
      },
      Some("""WITH liO AS (
             |  SELECT l_orderkey
             |  FROM lineitem
             |  GROUP BY l_orderkey
             |  HAVING count(DISTINCT l_suppkey) > 1
             |     AND count(DISTINCT CASE WHEN l_returnflag = 'R'
             |                             THEN l_suppkey END) = 1),
             |fails AS (
             |  SELECT DISTINCT l_orderkey AS f_orderkey, l_suppkey
             |  FROM lineitem WHERE l_returnflag = 'R')
             |SELECT s_name, count(*) AS numwait
             |FROM fails
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_1'
             |  AND f_orderkey IN (SELECT l_orderkey FROM liO)
             |  AND f_orderkey IN (SELECT o_orderkey FROM orders
             |                     WHERE o_orderstatus = 'F')
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name
             |LIMIT 20""".stripMargin)),

    // q187 — point-in-time dimension lookup (the feature-store
    // correctness op): for each (entity, probe time), the SCD2 version
    // (q98's intervals) valid AT that time — the join that prevents
    // training-serving skew and future-leakage in feature pipelines.
    // Implemented as the as-of UNION trick, not an interval join:
    // versions and probes union on (key, time), one window per key
    // carries the last version forward, probes read it — ONE shuffle on
    // the entity key at any scale, no per-probe re-scan of the history
    // (Q2-style correlated form) and no interval explosion. Tie rules:
    // a version starting exactly at the probe time IS visible
    // (src orders versions first); same-timestamp versions resolve to
    // the highest version number, matching the oracle's
    // (valid_from DESC, version DESC) pick.
    QuerySpec("q187_pit_lookup",
      (s, dir) => {
        val byCust = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val versions = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"),
            lag(col("o_orderpriority"), 1).over(byCust).as("prev"))
          .filter(col("prev").isNull || col("o_orderpriority") =!= col("prev"))
          .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
            lit(0).as("src"), col("o_orderpriority").as("prio"),
            // same byCust spec as the lag: version numbering and change
            // detection MUST order identically or versions mis-number
            row_number().over(byCust).as("version"))
        val probes = t(s, dir, "customer")
          .select(col("c_custkey").as("k"),
            explode(array(
              lit("1997-01-01").cast("timestamp"),
              lit("1999-01-01").cast("timestamp"),
              lit("2001-01-01").cast("timestamp"))).as("t"),
            lit(1).as("src"), lit(null).cast("string").as("prio"),
            lit(null).cast("int").as("version"))
        val w = Window.partitionBy("k")
          .orderBy(col("t"), col("src"), col("version"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        versions.unionByName(probes)
          .select(col("k"), col("t"), col("src"),
            last(col("version"), ignoreNulls = true).over(w).as("version"),
            last(col("prio"), ignoreNulls = true).over(w).as("o_orderpriority"))
          .filter(col("src") === 1)
          .select(col("k").as("o_custkey"),
            col("t").cast("timestamp_ntz").as("probe_ts"),
            col("o_orderpriority"), col("version"))
          .orderBy("o_custkey", "probe_ts")
      },
      Some("""WITH c AS (
             |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             |    lag(o_orderpriority, 1) OVER w AS prev
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |v AS (
             |  SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
             |    CAST(row_number() OVER w2 AS INTEGER) AS version
             |  FROM c WHERE prev IS NULL OR o_orderpriority <> prev
             |  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |p AS (SELECT c_custkey, t AS probe_ts FROM customer,
             |  UNNEST([TIMESTAMP '1997-01-01', TIMESTAMP '1999-01-01',
             |          TIMESTAMP '2001-01-01']) AS u(t)),
             |j AS (SELECT p.c_custkey, p.probe_ts, v.o_orderpriority, v.version,
             |    row_number() OVER (PARTITION BY p.c_custkey, p.probe_ts
             |      ORDER BY v.valid_from DESC, v.version DESC) AS rn
             |  FROM p LEFT JOIN v
             |    ON v.o_custkey = p.c_custkey AND v.valid_from <= p.probe_ts)
             |SELECT c_custkey AS o_custkey, probe_ts, o_orderpriority, version
             |FROM j WHERE rn = 1
             |ORDER BY o_custkey, probe_ts""".stripMargin)),

    // q196 — leave-one-out target encoding (the categorical-feature op
    // supervised pipelines use to avoid target leakage): each row's
    // category is encoded as the mean target of all OTHER rows in the
    // category — (S_cat − own) / (n_cat − 1). Category sums aggregate
    // once (category-grain rows), broadcast back, and the LOO value is
    // scan-local arithmetic: one pass, no self-join, no window. Sums
    // are decimal-exact; the subtraction and division are per-row IEEE
    // ops on identical doubles in both engines.
    QuerySpec("q196_target_encode",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        val cats = ord.groupBy("o_orderpriority")
          .agg(sum(col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("s_cat"),
            count(lit(1)).as("n_cat"))
        ord.join(broadcast(cats), "o_orderpriority")
          .filter(col("n_cat") > 1)
          .select(col("o_orderkey"), col("o_orderpriority"),
            round((col("s_cat") - col("o_totalprice")) / (col("n_cat") - 1), 6)
              .as("loo_encoding"))
          .orderBy("o_orderkey")
      },
      Some("""WITH c AS (SELECT o_orderpriority,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s_cat,
             |    count(*) AS n_cat
             |  FROM orders GROUP BY o_orderpriority)
             |SELECT o_orderkey, o_orderpriority,
             |  round((s_cat - o_totalprice) / (n_cat - 1), 6) AS loo_encoding
             |FROM orders JOIN c USING (o_orderpriority)
             |WHERE n_cat > 1
             |ORDER BY o_orderkey""".stripMargin)),

    // q198 — referential-health audit across EVERY FK edge of the
    // schema in one report: row count, null-key count, and orphan
    // count (left-anti against the dimension) per edge — the
    // whole-schema generalization of q08's single integrity check,
    // i.e. the pre-publish gate a warehouse runs after every load.
    // Each edge is an independent anti-join aggregated to ONE row
    // before the union, so the report's exchanges carry 7 rows total;
    // dimension key sets broadcast where small (the fact-side joins
    // stay shuffle-free for every dim-sized edge).
    QuerySpec("q198_fk_health",
      (s, dir) => {
        def edge(name: String, fact: DataFrame, key: String,
            dim: DataFrame, dimKey: String): DataFrame = {
          val orphans = fact.filter(col(key).isNotNull)
            .join(dim.select(col(dimKey)), col(key) === col(dimKey), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
          fact.agg(count(lit(1)).as("n_rows"),
              sum(when(col(key).isNull, 1L).otherwise(0L)).as("n_nulls"))
            .crossJoin(orphans)
            .select(lit(name).as("edge"), col("n_rows"), col("n_nulls"),
              col("n_orphans"))
        }
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val supp = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        Seq(
          edge("lineitem.orderkey", li, "l_orderkey", ord, "o_orderkey"),
          edge("lineitem.partkey", li, "l_partkey", t(s, dir, "part"), "p_partkey"),
          edge("lineitem.suppkey", li, "l_suppkey", supp, "s_suppkey"),
          edge("orders.custkey", ord, "o_custkey", cust, "c_custkey"),
          edge("customer.nationkey", cust, "c_nationkey", nat, "n_nationkey"),
          edge("supplier.nationkey", supp, "s_nationkey", nat, "n_nationkey"),
          edge("nation.regionkey", nat, "n_regionkey",
            t(s, dir, "region"), "r_regionkey"))
          .reduce(_.unionByName(_))
          .orderBy("edge")
      },
      Some {
        def e(name: String, fact: String, key: String,
            dim: String, dimKey: String): String =
          s"""SELECT '$name' AS edge, count(*) AS n_rows,
             |  CAST(SUM(CASE WHEN $key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  (SELECT count(*) FROM $fact f LEFT JOIN $dim d ON f.$key = d.$dimKey
             |   WHERE f.$key IS NOT NULL AND d.$dimKey IS NULL) AS n_orphans
             |FROM $fact""".stripMargin
        Seq(
          e("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          e("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
          e("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          e("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
          e("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
          e("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
          e("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
      }))
}
