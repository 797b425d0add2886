package graft.streaming

import java.util.UUID
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.queries.QuerySpec

/** Structured Streaming surface (SURVEY §2.9): the reference's `@daily`
  * full-refresh micro-batch (`airflow/dags/CompleteETL.py:974`) maps to a
  * file-source stream with `Trigger.AvailableNow` — "process everything
  * new, then stop". Result lands in a memory sink and is returned as a
  * batch DataFrame so the DuckDB oracle (date_trunc buckets over the same
  * parquet) can verify it.
  */
object StreamQueries {

  val specs: Seq[QuerySpec] = Seq(
    // q33 — real readStream → tumbling window agg → AvailableNow →
    // memory sink. Complete output mode: the bounded input ends, so all
    // windows must be emitted without waiting for a watermark to pass.
    QuerySpec("q33_stream_hourly",
      (s, dir) => {
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val mem = "stream_" + UUID.randomUUID().toString.replace("-", "")
        // The file stream source requires a directory; expose the single
        // parquet file through a temp dir symlink (read-only corpus).
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
        val src = s.readStream.schema(schema).parquet(tmp.toString)
        val withTs =
          if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
            src.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          else src
        val q = withTs
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream.format("memory").queryName(mem)
          .outputMode("complete").trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(mem)
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
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val mem = "stream_" + UUID.randomUUID().toString.replace("-", "")
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
        val q = s.readStream.schema(schema).parquet(tmp.toString)
          .dropDuplicates("user_id", "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"))
          .writeStream.format("memory").queryName(mem)
          .outputMode("complete").trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(mem).select("event_type", "n_users")
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
