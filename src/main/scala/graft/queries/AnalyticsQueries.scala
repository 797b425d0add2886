package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Stable, Tables}

/** Analytics-surface extensions beyond the reference's flat GROUP BY
  * (SURVEY §2.5/§2.8 footnotes): reshaping (unpivot/melt), statistical
  * aggregates, and time-series gap filling. All built-in Catalyst
  * operators; every query is deterministically ordered and type-stable
  * for the DuckDB hash-compare.
  */
object AnalyticsQueries {

  val specs: Seq[QuerySpec] = Seq(

    // q79 — melt-after-aggregate: the inverse of q51's pivot — wide measure
    // columns back to (metric, value) long form. Aggregate FIRST (6
    // groups), then unpivot the 6×4 cells: the reshape touches |groups|
    // rows, never the fact table, so the melt is free at any scale.
    QuerySpec("q79_melt_agg",
      (s, dir) => {
        val wide = Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(Stable.dsum(col("l_quantity"), 2).as("qty"),
            Stable.dsum(col("l_extendedprice"), 2).as("base"),
            Stable.dsum(col("l_discount"), 4).as("disc"),
            Stable.dsum(col("l_tax"), 4).as("tax"))
        wide.unpivot(
            Array(col("l_returnflag"), col("l_linestatus")),
            Array(col("qty"), col("base"), col("disc"), col("tax")),
            "metric", "val")
          .orderBy("l_returnflag", "l_linestatus", "metric")
      },
      Some("""WITH w AS (SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS base,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc,
             |  CAST(SUM(CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS tax
             | FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, l_linestatus, metric, val FROM (
             |  SELECT l_returnflag, l_linestatus, 'qty' AS metric, qty AS val FROM w
             |  UNION ALL SELECT l_returnflag, l_linestatus, 'base', base FROM w
             |  UNION ALL SELECT l_returnflag, l_linestatus, 'disc', disc FROM w
             |  UNION ALL SELECT l_returnflag, l_linestatus, 'tax', tax FROM w)
             |ORDER BY l_returnflag, l_linestatus, metric""".stripMargin)),

    // q80 — statistical aggregates (stddev/variance/correlation/
    // covariance): the moments the BI layer computes over measures.
    // All partial+final mergeable (sum/sum-of-squares/co-moments), so the
    // map-side combine shape survives scale-up. Rounded before compare —
    // the moment formulas accumulate doubles in engine-specific order.
    QuerySpec("q80_stats_aggs",
      (s, dir) =>
        Tables.load(s, dir, "lineitem").groupBy("l_returnflag").agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"),
          count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | round(stddev_samp(l_quantity), 4) AS sd_qty,
             | round(var_samp(l_discount), 6) AS var_disc,
             | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             | round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
             | count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // q81 — date-spine gap filling: generate the full calendar between
    // min and max order date (sequence + explode from a 1-row range
    // aggregate), left-join the daily counts, zero-fill missing days —
    // the time-series densification every downstream window/trend op
    // assumes. At scale the spine is O(days) (tiny, broadcast); the
    // daily aggregation is the only fact-table shuffle.
    QuerySpec("q81_date_spine",
      (s, dir) => {
        val d = Tables.load(s, dir, "orders")
          .select(to_date(col("o_orderdate")).as("d"))
        val spine = d.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val daily = d.groupBy("d").agg(count(lit(1)).as("n"))
        spine.join(daily, spine("day") === daily("d"), "left")
          .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
          .orderBy("day")
      },
      Some("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
             |r AS (SELECT min(d) AS lo, max(d) AS hi FROM d),
             |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
             |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM r),
             |daily AS (SELECT d, count(*) AS n FROM d GROUP BY d)
             |SELECT day, coalesce(n, 0) AS n_orders
             |FROM spine LEFT JOIN daily ON day = d ORDER BY day""".stripMargin)))
}
