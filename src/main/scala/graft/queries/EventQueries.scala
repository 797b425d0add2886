package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Time-series operators over `events` — the join/window families Spark
  * gives for free that the reference's semantics imply but never exercise
  * (SURVEY §2.4 "other join families", §2.6). Both are composed from
  * windows rather than custom plans: an as-of join is `last(...ignoreNulls)`
  * over an ordered frame; sessionization is a lag-gap cumulative sum. Each
  * is one shuffle on (user_id) — the natural partitioning key at scale.
  *
  * Ordering parity trap: `ts` is ns in the source; both engines order by
  * the µs-truncated value plus event_id so ties are broken identically.
  */
object EventQueries {

  val specs: Seq[QuerySpec] = Seq(

    // q36 — as-of join: for each purchase, the most recent prior signup
    // of the same user (NULL if none).
    QuerySpec("q36_asof_signup",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val prior = last(
          when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w)
        ev.withColumn("prev_signup_ts", prior)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp_ntz").as("purchase_ts"),
            col("prev_signup_ts").cast("timestamp_ntz").as("prev_signup_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, purchase_ts, prev_signup_ts FROM (
             |  SELECT event_id, user_id, event_type,
             |    CAST(ts AS TIMESTAMP) AS purchase_ts,
             |    last_value(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_signup_ts
             |  FROM events)
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // q37 — gap-based sessionization (30 min inactivity closes a session):
    // lag diff → new-session flag → running sum = session id → per-session
    // rollup. The batch analog of Structured Streaming session windows.
    QuerySpec("q37_sessionize",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val newSess = when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1).otherwise(0)
        ev.withColumn("sess_id",
            sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sess_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).cast("timestamp_ntz").as("sess_start"),
            max(col("ts")).cast("timestamp_ntz").as("sess_end"))
          .orderBy("user_id", "sess_id")
      },
      Some("""SELECT user_id, sess_id, count(*) AS n_events,
             | min(CAST(ts AS TIMESTAMP)) AS sess_start,
             | max(CAST(ts AS TIMESTAMP)) AS sess_end
             |FROM (
             |  SELECT user_id, ts, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
             |  FROM (
             |    SELECT user_id, ts, event_id,
             |      CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
             |             - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
             |             > 30 * 60 * 1000000 THEN 1
             |           WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL THEN 1
             |           ELSE 0 END AS new_sess
             |    FROM events))
             |GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin)),

    // q52 — range (interval) join: for each error event, how many other
    // events of the same user fall within ±5 minutes. Equi key (user_id)
    // + range predicate: Spark plans the equi part as a hash/sort-merge
    // join and evaluates the band as a post-condition — the standard
    // interval-join shape; at scale the user_id shuffle bounds each
    // comparison set to one user's events.
    QuerySpec("q52_range_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val oth = ev.select(col("user_id").as("uid2"),
          col("ts").as("ts2"), col("event_id").as("eid2"))
        err.join(oth,
            col("user_id") === col("uid2") && col("eid2") =!= col("event_id") &&
              col("ts2").between(
                col("ts") - expr("INTERVAL 5 MINUTES"),
                col("ts") + expr("INTERVAL 5 MINUTES")))
          .groupBy("event_id").agg(count(lit(1)).as("n_neighbors"))
          .orderBy("event_id")
      },
      Some("""SELECT a.event_id, count(*) AS n_neighbors
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND b.event_id <> a.event_id
             |  AND CAST(b.ts AS TIMESTAMP) BETWEEN CAST(a.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
             |                                  AND CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
             |WHERE a.event_type = 'error'
             |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin)),

    // q60 — HLL sketch distinct counting (SURVEY §2.5 footnote): at 100 TB
    // exact countDistinct shuffles every distinct value; HLL++ is one pass
    // over the data with fixed-size mergeable sketches — the only shape
    // that survives a billion-key cardinality estimate. No DuckDB oracle
    // (sketch internals are engine-specific → rows-only check); accuracy
    // vs the exact count is asserted in NewOpsSpec at rsd=0.01.
    QuerySpec("q60_approx_distinct",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      None))
}
