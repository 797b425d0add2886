package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType
import graft.queries.QuerySpec

/** Structured Streaming surface (SURVEY §2.9): the reference's `@daily`
  * full-refresh micro-batch (`airflow/dags/CompleteETL.py:974`) maps to a
  * file-source stream with `Trigger.AvailableNow` — "process everything
  * new, then stop". Results land in a memory sink and are returned as
  * batch DataFrames so the DuckDB oracle (bucket SQL over the same
  * parquet) can verify them.
  */
object StreamQueries {

  /** events.parquet as a file-source stream. The source requires a
    * directory, so the single file is exposed through a temp-dir symlink
    * (the corpus is read-only). ns→µs normalization mirrors
    * [[graft.core.Tables.load]]. */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val tmp = Files.createTempDirectory("graft_stream_")
    Files.createSymbolicLink(
      tmp.resolve("events.parquet"),
      Paths.get(s"$dir/events.parquet").toAbsolutePath)
    val src = s.readStream.schema(schema).parquet(tmp.toString)
    if (schema("ts").dataType == LongType)
      src.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else src
  }

  /** Run a (bounded) streaming DataFrame to completion into a uniquely
    * named memory sink; return the sink table. Complete output mode: the
    * input ends, so every window must be emitted without waiting for a
    * watermark to pass it. */
  private def runComplete(s: SparkSession, df: DataFrame): DataFrame = {
    val mem = "stream_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream.format("memory").queryName(mem)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(mem)
  }

  val specs: Seq[QuerySpec] = Seq(

    // q33 — tumbling 1 h windows per event type on a real stream.
    QuerySpec("q33_stream_hourly",
      (s, dir) => {
        val agg = eventStream(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
        runComplete(s, agg)
          .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
            col("event_type"), col("n_events"))
          .orderBy("hour_start", "event_type")
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             | event_type, count(*) AS n_events
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // q40 — streaming deduplication: dropDuplicates state across
    // micro-batches, then an aggregate whose result is order-independent
    // (distinct users per event type), so which duplicate survives doesn't
    // affect the output. Batch oracle: COUNT(DISTINCT). For unbounded
    // streams the production form is dropDuplicatesWithinWatermark; plain
    // dropDuplicates is correct for this bounded AvailableNow backfill.
    QuerySpec("q40_stream_dedup",
      (s, dir) => {
        val agg = eventStream(s, dir)
          .dropDuplicates("user_id", "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"))
        runComplete(s, agg)
          .select("event_type", "n_users")
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // q42 — sliding event-time windows (1 h length, 15 min slide) with a
    // watermark on a real stream: each event lands in 4 overlapping
    // windows. Oracle: every event joined to offsets 0..3 on the 15-min
    // grid (time_bucket is epoch-aligned like Spark's window origin).
    QuerySpec("q42_stream_sliding",
      (s, dir) => {
        val agg = eventStream(s, dir)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(count(lit(1)).as("n_events"))
        runComplete(s, agg)
          .select(col("window.start").cast("timestamp_ntz").as("win_start"),
            col("n_events"))
          .orderBy("win_start")
      },
      Some("""SELECT ws AS win_start, count(*) AS n_events FROM (
             |  SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) - (k * INTERVAL '15 minutes') AS ws
             |  FROM events, generate_series(0, 3) t(k))
             |GROUP BY ws ORDER BY ws""".stripMargin)))
}
