package graft

import java.nio.file.Files
import java.util.UUID
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Output-mode semantics (SURVEY §2.9): for a bounded AvailableNow
  * backfill processed in one micro-batch, update mode must emit exactly
  * the rows complete mode ends with — each touched window once. Guards
  * the mode choice in the stream queries against silent semantic drift. */
class StreamModesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(df: DataFrame, mode: String): Seq[(String, Long)] = {
    val mem = "modes_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream.format("memory").queryName(mem)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(mem).as[(String, Long)].collect().toSeq.sorted
  }

  test("update mode == complete mode for a single AvailableNow batch") {
    val dir = Files.createTempDirectory("modes_src")
    Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    def agg = spark.readStream.schema(schema).parquet(dir.toString)
      .groupBy("k").agg(count(lit(1)).as("n"))
    val complete = run(agg, "complete")
    val update = run(agg, "update")
    assert(complete == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    assert(update == complete)
  }

  test("dropDuplicatesWithinWatermark: dups inside the horizon collapse, " +
      "state expires behind the watermark") {
    // The production streaming-dedup form SURVEY §2.9 names (q40 uses
    // plain dropDuplicates, correct for a bounded backfill): dedup state
    // is only kept while a duplicate could still arrive inside the
    // watermark delay, so state size is bounded by the time horizon —
    // the property that lets dedup run forever at 100 TB/day.
    val dir = Files.createTempDirectory("wmdedup_src")
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(minOff: Int) = new java.sql.Timestamp(base.getTime + minOff * 60000L)
    Seq((1L, ts(0)), (1L, ts(1)),   // dup inside the 10-min horizon
        (2L, ts(2)), (3L, ts(60)))  // unique keys
      .toDF("k", "ts").write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val dedup = spark.readStream.schema(schema).parquet(dir.toString)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val mem = "wmdedup_" + UUID.randomUUID().toString.replace("-", "")
    val q = dedup.writeStream.format("memory").queryName(mem)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val keys = spark.table(mem).select("k").as[Long].collect().toSeq.sorted
    assert(keys == Seq(1L, 2L, 3L), s"got $keys")
  }

  test("watermark drops late data: an event behind the checkpointed " +
      "watermark never reaches its (already-final) window") {
    // SURVEY §2.9 "watermarks + late-data drop": run 1 advances the
    // watermark past a window and finalizes it (append emits it); run 2
    // delivers an event for that window that is older than the
    // checkpoint-persisted watermark — state for the window is gone and
    // the event is discarded, so the emitted count never changes. This
    // is the mechanism that bounds window state at 100 TB/day.
    val src = Files.createTempDirectory("late_src")
    val out = Files.createTempDirectory("late_out").toString
    val ckpt = Files.createTempDirectory("late_ckpt").toString
    def ts(hm: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $hm:00")
    def runOnce(): Unit = {
      val schema = spark.read.parquet(src.toString).schema
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "30 minutes")).agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def emitted(): Map[java.sql.Timestamp, Long] =
      spark.read.parquet(out).as[(java.sql.Timestamp, Long)]
        .collect().groupMapReduce(_._1)(_._2)(_ + _)
    // run 1: two on-time events in [10:00, 10:30), then 11:00 pushes the
    // watermark to 10:50 — that window is final and emitted
    Seq((1L, ts("10:05")), (2L, ts("10:20")), (3L, ts("11:00")))
      .toDF("id", "ts").write.mode("append").parquet(src.toString)
    runOnce()
    val afterRun1 = emitted()
    assert(afterRun1.get(ts("10:00")).contains(2L),
      s"window not finalized: $afterRun1")
    // run 2: a LATE event for the final window (10:10 < watermark 10:50)
    // plus an on-time one that finalizes [11:00, 11:30)
    Seq((4L, ts("10:10")), (5L, ts("11:40")))
      .toDF("id", "ts").write.mode("append").parquet(src.toString)
    runOnce()
    val afterRun2 = emitted()
    assert(afterRun2.get(ts("10:00")).contains(2L),
      s"late event leaked into the finalized window: $afterRun2")
    assert(afterRun2.get(ts("11:00")).contains(1L),
      s"on-time window missing: $afterRun2")
  }

  test("checkpoint resume: second AvailableNow run processes ONLY new files") {
    // Incremental ingestion — the engine's replacement for the reference's
    // daily full re-read (SURVEY §2.9): a restarted stream resumes from
    // the checkpoint's file log, so each file is processed exactly once
    // across runs no matter how often the job is re-launched.
    val src = Files.createTempDirectory("ckpt_src")
    val out = Files.createTempDirectory("ckpt_out").toString
    val ckpt = Files.createTempDirectory("ckpt_loc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.mode("append").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    Seq((3L, "c")).toDF("id", "tag")
      .write.mode("append").parquet(src.toString)
    runOnce()
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSeq.sorted
    // batch-1 rows NOT reprocessed; batch-2 file picked up exactly once
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
