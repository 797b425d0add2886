package graft
import org.apache.spark.sql.SparkSession
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q07_star_join_revenue", "q10_pricing_summary", "q31_cosine_topk",
        "q06_filter_nulls", "q56_kmeans_ivf", "q57_array_funcs", "q59_ivf_search")
    for (q <- qs) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
