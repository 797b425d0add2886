package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): run named queries
  * and print every Spark job's wall time + call site, to see how a
  * multi-commit (txlog/streaming) query's seconds decompose. */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, site) = starts.getOrDefault(je.jobId, (0L, "?"))
        val ms = (System.nanoTime() - t0) / 1e6
        if (t0 > 0 && ms >= 20)
          println(f"[job] ${je.jobId}%4d ${ms}%8.0f ms  $site")
      }
    })

    for (name <- args; it <- 1 to 2) {
      println(s"=== $name iter $it")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"=== $name total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      Thread.sleep(300)
    }
    spark.stop()
  }
}
