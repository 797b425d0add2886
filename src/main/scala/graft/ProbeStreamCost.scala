package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): where does a
  * bounded AvailableNow streaming query spend its ~2 s? Runs a
  * representative stream twice and dumps the per-batch
  * StreamingQueryProgress duration breakdown. */
object ProbeStreamCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()

    for (iter <- 1 to 3; ck <- Seq("tmp", "shm"); parts <- Seq("8")) {
      println(s"--- iter $iter ck=$ck parts=$parts")
      val s = graft.core.Tuned.session(spark,
        "spark.sql.shuffle.partitions" -> parts)
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val tmp = graft.queries.Scratch.tmp("probe_scost_")
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(tmp, "events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val src = s.readStream.schema(schema).parquet(tmp)
        .withColumn("ts", col("ts"))
      val agg = src
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val mem = "probe_" + iter + "_" + System.nanoTime()
      val t0 = System.nanoTime()
      val w0 = agg.writeStream.format("memory").queryName(mem)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val w = if (ck == "shm")
        w0.option("checkpointLocation", graft.queries.Scratch.tmp("probe_ck_"))
      else w0
      val q = w.start()
      q.awaitTermination()
      val tRun = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = s.table(mem).count()
      val tRead = (System.nanoTime() - t1) / 1e9
      println(f"[scost] stream total=$tRun%.2f s, sink read=$tRead%.2f s rows=$n")
      q.recentProgress.foreach { p =>
        println(s"[scost] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
