package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: does parallelizing the single-row-group scan pay for
  * decimal-heavy aggregates (q189-class)? */
object ProbePlans {
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

    def t(name: String)(df: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${runs.map(r => f"$r%5.2f").mkString(" ")}")
    }

    val n = count(lit(1)).cast("double")
    def m(c: org.apache.spark.sql.Column, scale: Int) =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(18, scale)))
        .cast("double") / n
    def aggs(df: DataFrame): DataFrame = {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val z = col("l_discount")
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          m(x, 2).as("ex"), m(y, 2).as("ey"), m(z, 4).as("ez"),
          m(x * x, 2).as("exx"), m(y * y, 2).as("eyy"), m(z * z, 6).as("ezz"),
          m(x * y, 2).as("exy"), m(x * z, 4).as("exz"), m(y * z, 4).as("eyz"))
    }
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
    t("serial (current)")(aggs(li))
    t("repartition(32) first")(aggs(li.repartition(32)))
    t("maxPartitionBytes probe") {
      val s2 = spark.newSession()
      SparkEntry.configure(s2)
      s2.conf.set("spark.sql.files.maxPartitionBytes", "2m")
      aggs(s2.read.parquet(s"$dir/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount"))
    }
    spark.stop()
  }
}
