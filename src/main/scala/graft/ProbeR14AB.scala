package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): A/B a conf set over
  * a named query list — each variant runs in its own SparkSession
  * (sequentially, same JVM), min-of-2 per query like the bench.
  * Usage: runMain graft.ProbeR14AB <variant> <q1,q2,...>
  * Variants are hardcoded below (base / maint / rocks / aqe). */
object ProbeR14AB {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val names = args(1).split(",").toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val extra: Seq[(String, String)] = variant match {
      case "base" => Seq.empty
      case "maint" => Seq(
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s")
      case "rocks" => Seq(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case "aqe" => Seq(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
      case "aqe16" => Seq(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m")
    }
    var b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    // deterministic signal alongside the (noisy-box) wall times: the
    // number of driver-scheduled jobs per query
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
      })
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val all = SparkEntry.queries
    var total = 0.0
    all.keys.toSeq.sorted.filter(n => names.exists(n.contains)).foreach { n =>
      var nJobs = 0
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        jobs.set(0)
        try all(n)(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[ab] $n FAILED: ${e.getMessage}") }
        spark.catalog.clearCache()
        nJobs = jobs.get()
        (System.nanoTime() - t0) / 1e9
      }
      total += ts.min
      println(f"[ab] $variant $n%-36s ${ts.min}%6.2f s  jobs=$nJobs%3d load=$loadAvg%.1f")
    }
    println(f"[ab] $variant TOTAL $total%8.2f s load=$loadAvg%.1f")
    spark.stop()
  }
}
