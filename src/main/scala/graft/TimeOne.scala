package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("t")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.configure(spark)
    val dir = args(0)
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      val t2 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      System.err.println(f"[time] $name cold=${(t1-t0)/1e9}%.2f warm=${(t3-t2)/1e9}%.2f")
    }
    spark.stop()
  }
}
