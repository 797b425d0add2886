package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): run named queries
  * while sampling ALL threads; print the full stack of any sample whose
  * frames mention SchemaMergeUtils — locating the residual footer-merge
  * callers after the r13 scanUnderLogSchema change. */
object ProbeR14Merge {
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
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (_, st) =>
            if (st.exists(_.getClassName.contains("SchemaMergeUtils"))) {
              val tail = st.filter(f =>
                  f.getClassName.startsWith("graft.") ||
                  f.getClassName.contains("SchemaMergeUtils") ||
                  f.getMethodName == "sql" ||
                  f.getClassName.contains("foreachBatch") ||
                  f.getClassName.contains("TxLog"))
                .map(f => s"${f.getClassName.split('.').last}." +
                  s"${f.getMethodName}:${f.getLineNumber}")
                .mkString(" <- ")
              seen.add(tail)
            }
          }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    for (name <- args; _ <- 1 to 2) {
      seen.clear()
      sampling = true
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      sampling = false
      import scala.jdk.CollectionConverters._
      println(s"=== $name merge-stack samples: ${seen.size}")
      seen.asScala.toSeq.groupBy(identity).view.mapValues(_.size)
        .toSeq.sortBy(-_._2).take(6)
        .foreach { case (s, n) => println(s"[mrg] $n  $s") }
    }
    spark.stop()
  }
}
