package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): where does an
  * alternatingStar round spend its time on a tiny (25k-edge) graph? */
object ProbeCC {
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
    // materialize the q334 core-core edge set once, re-read from parquet
    val eps = 0.02
    val pts = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
    val nb = graft.ops.GridNeighbors.epsPairs(
      pts.select(col("vec_id").as("id"), col("x"), col("y")),
      eps, denseThreshold = 64, salts = 8).persist()
    val core = nb.groupBy("ai").agg(count(lit(1)).as("nnb"))
      .filter(col("nnb") + 1 >= 5).select(col("ai").as("id")).persist()
    val ce = nb
      .join(core.select(col("id").as("ai")), "ai")
      .join(core.select(col("id").as("bi")), "bi")
      .select(col("ai").as("src"), col("bi").as("dst"))
    val edgePath = "/dev/shm/probe_cc_edges"
    ce.write.mode("overwrite").parquet(edgePath)
    spark.catalog.clearCache()
    println(s"[probecc] edges = ${spark.read.parquet(edgePath).count()}")

    def variant(name: String, parts: String, aqe: String): Unit = {
      val ns = graft.core.Tuned.session(spark,
        "spark.sql.shuffle.partitions" -> parts,
        "spark.sql.adaptive.enabled" -> aqe)
      val edges = ns.read.parquet(edgePath)
      val t0 = System.nanoTime()
      val l = graft.ops.ConnectedComponents.alternatingStar(
        edges, assumeDistinct = true)
      val n = l.count()
      println(f"[probecc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (labels=$n)")
    }
    def variantMin(name: String, parts: String, aqe: String): Unit = {
      val ns = graft.core.Tuned.session(spark,
        "spark.sql.shuffle.partitions" -> parts,
        "spark.sql.adaptive.enabled" -> aqe)
      val edges = ns.read.parquet(edgePath)
      val t0 = System.nanoTime()
      val l = graft.ops.ConnectedComponents.minLabelPropagation(edges)
      val n = l.count()
      println(f"[probecc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (labels=$n)")
    }
    for (it <- 1 to 2) {
      println(s"--- iter $it")
      variant("star p4 aqe-off", "4", "false")
      variant("star p1 aqe-off", "1", "false")
      variant("star p4 aqe-on", "4", "true")
      variant("star p32 aqe-on", "32", "true")
      variantMin("minlabel p4 aqe-off", "4", "false")
      variantMin("minlabel p1 aqe-off", "1", "false")
    }
    spark.stop()
  }
}
