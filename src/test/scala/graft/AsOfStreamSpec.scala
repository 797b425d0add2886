package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Drives [[graft.streaming.StreamQueries.AsOfStreamProcessor]] through a
  * MemoryStream with hand-advanced watermarks — the out-of-order path the
  * bounded relay can't reach: a purchase that is NOT final at its key's
  * first timer firing must be HELD (not emitted early, not dropped) and
  * emitted on the re-armed timer once the watermark passes it. q243's
  * oracle proves end-state correctness; this spec proves the emission
  * TIMING that makes the operator deployable on an unbounded stream. */
class AsOfStreamSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("held purchases emit only after the watermark passes them") {
    val s: org.apache.spark.sql.SparkSession = graft.core.Tuned.session(spark,
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val ev = in.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (col("event_type") === "click").as("is_click"))
      .as[(Long, Long, Long, Boolean)]
    val out = ev.groupByKey(_._1)
      .transformWithState(new graft.streaming.StreamQueries.AsOfStreamProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "purchase_id", "click_id", "lag_us")
    val ckpt = java.nio.file.Files.createTempDirectory("asof_spec_").toString
    val q = out.writeStream.format("memory").queryName("asof_spec")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      def emitted(): Set[Long] =
        s.table("asof_spec").select("purchase_id").collect()
          .map(_.getLong(0)).toSet

      // batch 1: user 1 clicks at 10s/100s, purchase at 20s.
      in.addData((1L, ts(10), 1L, "click"), (1L, ts(20), 2L, "purchase"),
        (1L, ts(100), 3L, "click"))
      q.processAllAvailable() // wm after batch = 100s; timer 100.001s unexpired
      assert(emitted() == Set.empty[Long], "nothing final before any firing")

      // batch 2: late-window purchase at 250s (+ a 200s click).
      in.addData((1L, ts(200), 4L, "click"), (1L, ts(250), 5L, "purchase"))
      q.processAllAvailable() // wm 100s during batch: still nothing fires
      // batch 3: unrelated key advances wm to 300s -> user 1 timer fires;
      // purchase 20s is final (< 300s emitted), purchase 250s is final too.
      in.addData((9L, ts(300), 9L, "click"))
      q.processAllAvailable()
      assert(emitted().contains(2L), "watermark-final purchase must emit")
      // purchase 250s: wm at firing was 250s (end of batch 2)? — assert
      // precisely below via full rows instead of guessing.
      val rows = s.table("asof_spec")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows(2L) == 1L, "purchase@20s matches click@10s, not click@100s")

      // drive wm far past everything: any held purchase must now emit.
      in.addData((9L, ts(1000), 10L, "click"))
      q.processAllAvailable()
      in.addData((9L, ts(2000), 11L, "click"))
      q.processAllAvailable()
      val finalRows = s.table("asof_spec")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(finalRows.contains(5L), "held purchase lost after re-arm")
      assert(finalRows(5L) == 4L,
        "purchase@250s must match click@200s (latest at-or-before)")
    } finally {
      q.stop()
    }
  }

  test("a purchase arriving AFTER its key's state was flushed still sees " +
      "finalized clicks (the unbounded-lookback floor)") {
    val s: org.apache.spark.sql.SparkSession = graft.core.Tuned.session(spark,
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val ev = in.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), (col("event_type") === "click").as("is_click"))
      .as[(Long, Long, Long, Boolean)]
    val out = ev.groupByKey(_._1)
      .transformWithState(new graft.streaming.StreamQueries.AsOfStreamProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "purchase_id", "click_id", "lag_us")
    val ckpt = java.nio.file.Files.createTempDirectory("asof_floor_").toString
    val q = out.writeStream.format("memory").queryName("asof_floor")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      def rows(): Map[Long, Long] = s.table("asof_floor")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap

      // batch 1: two clicks + one purchase for user 2; watermark relay
      // (key 9) far ahead so user 2's timer fires with NOTHING held —
      // the path that used to clear the click state entirely.
      in.addData((2L, ts(10), 1L, "click"), (2L, ts(15), 2L, "click"),
        (2L, ts(20), 3L, "purchase"))
      q.processAllAvailable()
      in.addData((9L, ts(300), 90L, "click"))
      q.processAllAvailable()
      assert(rows().get(3L).contains(2L),
        "purchase@20s must match click@15s at the first firing")

      // batch 3: a NEW purchase for user 2, long after the flush. Its
      // only candidate is the compacted floor (click@15s, id 2).
      in.addData((2L, ts(400), 4L, "purchase"))
      q.processAllAvailable()
      in.addData((9L, ts(500), 91L, "click"))
      q.processAllAvailable()
      assert(rows().get(4L).contains(2L),
        s"flushed key lost its click floor: ${rows()}")
      // and a fresh click supersedes the floor for later purchases
      in.addData((2L, ts(520), 5L, "click"), (2L, ts(530), 6L, "purchase"))
      q.processAllAvailable()
      in.addData((9L, ts(900), 92L, "click"))
      q.processAllAvailable()
      assert(rows().get(6L).contains(5L),
        s"newer click must beat the floor: ${rows()}")
    } finally {
      q.stop()
    }
  }
}
