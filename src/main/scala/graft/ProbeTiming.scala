package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch perf probe (not part of the driver contract): times named
  * queries at sf0.1, twice each, to locate real costs vs variance.
  * Usage: runMain graft.ProbeTiming [queryName ...] */
object ProbeTiming {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s run1=${runs(0)}%6.2f s  run2=${runs(1)}%6.2f s")
    }

    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q71_edit_distance", "q50_simhash_pairs", "q35_ngram_jaccard",
        "q29_minhash_pairs", "q10_pricing_summary")
    for (q <- qs) t(q)(SparkEntry.queries(q)(spark, dir))
    spark.stop()
  }
}
