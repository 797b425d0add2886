package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): sample the `main`
  * thread's stack every 20 ms while a named query runs, then print the
  * most common frames — locates driver-side time that job metrics miss
  * (log folds, footer reads, plan analysis). */
object ProbeSample {
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

    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          // topmost graft/spark frame below the thread machinery
          val tag = st.find(f =>
              f.getClassName.startsWith("graft.") ||
              f.getClassName.contains("parquet") ||
              f.getClassName.contains("datasources"))
            .orElse(st.headOption)
            .map(f => s"${f.getClassName}.${f.getMethodName}")
            .getOrElse("?")
          // also record whether we're inside a job wait
          val inJob = st.exists(_.getMethodName == "runJob")
          samples.add((if (inJob) "JOB " else "DRV ") + tag)
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (name <- args; it <- 1 to 2) {
      samples.clear()
      val t0 = System.nanoTime()
      sampling = true
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      sampling = false
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"=== $name iter $it total $secs%.2f s, ${samples.size} samples")
      import scala.jdk.CollectionConverters._
      samples.asScala.toSeq.groupBy(identity).view.mapValues(_.size)
        .toSeq.sortBy(-_._2).take(18)
        .foreach { case (frame, n) => println(f"[stk] $n%4d  $frame") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
