package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch perf probe (not part of the driver contract): times the hot
  * bench queries at sf0.1, twice each, to locate real costs vs variance. */
object ProbeTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s run1=${runs(0)}%6.2f s  run2=${runs(1)}%6.2f s")
    }

    for (q <- Seq("q29_minhash_pairs", "q35_ngram_jaccard", "q34_simhash",
        "q50_simhash_pairs", "q03_dedup_composite", "q49_region_top_customers",
        "q10_pricing_summary", "q21_rollup_revenue", "q26_quality_score"))
      time(q) { SparkEntry.queries(q)(spark, dir) }
    spark.stop()
  }
}
