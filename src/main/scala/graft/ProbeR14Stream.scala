package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): decompose the
  * bounded-stream per-query floor for round 14 — where do the ~2 s go?
  *  - times session clone / schema read / start→termination / sink read
  *  - prints per-batch StreamingQueryProgress durations (incl. the
  *    trailing NO-DATA batch complete-mode queries pay for nothing)
  *  - A/Bs spark.sql.streaming.noDataMicroBatches.enabled for a
  *    complete-mode aggregation and prints both results' row counts +
  *    a content hash so equality is checked, not assumed. */
object ProbeR14Stream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def hashOf(df: org.apache.spark.sql.DataFrame): Long = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols.map(_.cast("string")): _*).as("h"))
        .agg(coalesce(expr("bit_xor(h)"), lit(0L))).head().getLong(0)
    }

    for (it <- 1 to 3; noData <- Seq("true", "false")) {
      println(s"--- iter $it noDataMicroBatches=$noData")
      var t0 = System.nanoTime()
      val s = graft.core.Tuned.session(spark,
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> noData)
      val tClone = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val tSchema = (System.nanoTime() - t0) / 1e9
      val tmp = graft.queries.Scratch.tmp("probe_r14_")
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(tmp, "events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      // representative runComplete shape: watermarked windowed agg,
      // complete output (q33/q34-class)
      val src = graft.core.Tables.normalizeTs(
        s.readStream.schema(schema).parquet(tmp))
      val agg = src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      t0 = System.nanoTime()
      val mem = "p14_" + it + "_" + noData + "_" + System.nanoTime()
      val q = agg.writeStream.format("memory").queryName(mem)
        .option("checkpointLocation", graft.queries.Scratch.streamCk())
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val tStream = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val res = s.table(mem)
      val n = res.count()
      val h = hashOf(res)
      val tRead = (System.nanoTime() - t0) / 1e9
      println(f"[r14s] clone=$tClone%.3f schema=$tSchema%.3f " +
        f"stream=$tStream%.3f read=$tRead%.3f rows=$n hash=$h%016x")
      q.recentProgress.foreach { p =>
        println(s"[r14s] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
