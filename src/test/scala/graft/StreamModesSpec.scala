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
