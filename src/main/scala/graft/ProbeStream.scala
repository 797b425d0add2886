package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: streaming query timings after state-partition sizing. */
object ProbeStream {
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

    def t(name: String): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s run1=${runs(0)}%6.2f run2=${runs(1)}%6.2f  conf=${spark.conf.get("spark.sql.shuffle.partitions")}")
    }

    for (q <- Seq("q33_stream_hourly", "q40_stream_dedup", "q42_stream_sliding",
        "q46_stream_sessions", "q61_stream_session_window", "q69_stream_static_join"))
      t(q)
    spark.stop()
  }
}
