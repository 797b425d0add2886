package graft

import java.nio.file.{Files, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe: chained stateful aggregation flush behavior (q230).
  * This probe found the sentinel-filter trap: a deterministic pre-agg
  * filter excluding the sentinels is pushed below the watermark node
  * into the scan, so the watermark never advances past the real data
  * and the final windows never flush (batches showed rows=0 for the
  * sentinel files and a frozen watermark). Kept runnable for the next
  * streaming-eviction investigation. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.01"

    import org.apache.spark.sql.streaming.StreamingQueryListener
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} " +
          p.stateOperators.map(so =>
            s"(op=${so.operatorName} upd=${so.numRowsUpdated} " +
            s"drop=${so.numRowsDroppedByWatermark} out=${so.numRowsRemoved} tot=${so.numRowsTotal})")
            .mkString(" "))
      }
    })

    // inline 3-file relay
    val t = Files.createTempDirectory("probe_relay_").toString
    val ev = graft.core.Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    ev.coalesce(1).write.mode(SaveMode.Overwrite).parquet(t)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    import spark.implicits._
    for ((days, ids) <- Seq((30L, (-1L, -2L)), (60L, (-3L, -4L)))) {
      val sentTs = new java.sql.Timestamp(maxTs.getTime + days * 86400 * 1000)
      Seq((ids._1, sentTs, ids._1, "click"), (ids._2, sentTs, ids._2, "purchase"))
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode(SaveMode.Append).parquet(t)
    }
    val files = Files.list(Paths.get(t))
    val parts = try files.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        .sortBy(p => Files.getLastModifiedTime(p).toMillis)
      finally files.close()
    val t0 = Files.getLastModifiedTime(parts.head).toMillis
    parts.zipWithIndex.tail.foreach { case (p, i) =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + 60000L * i))
    }
    parts.foreach(p => println(s"[probe] file=${p.getFileName} mtime=${Files.getLastModifiedTime(p).toMillis}"))

    val schema = spark.read.parquet(t).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(t)
    val quarter = src
      .withWatermark("ts", "10 minutes")
      .filter(col("event_id") >= 0)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hourly = quarter
      .groupBy(window(window_time(col("window")), "1 hour"), col("event_type"))
      .agg(sum(col("n")).as("total"), max(col("n")).as("peak"))
    val mem = "probe_" + UUID.randomUUID().toString.replace("-", "")
    val q = hourly.writeStream.format("memory").queryName(mem)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    Thread.sleep(500)
    val n = spark.table(mem).count()
    println(s"[probe] q230 rows=$n (expect 3385 at sf0.01)")
  }
}
