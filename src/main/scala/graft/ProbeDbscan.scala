package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): phase timing for
  * q334's DBSCAN pipeline at sf0.1. */
object ProbeDbscan {
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

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val eps = 0.02
      val pts = Tables0.load(spark, dir)
      phase("pts.count")(pts.count())
      val nb = graft.ops.GridNeighbors.epsPairs(
        pts.select(col("vec_id").as("id"), col("x"), col("y")),
        eps, denseThreshold = 64, salts = 8).persist()
      phase("nb materialize")(nb.count())
      val core = nb.groupBy("ai").agg(count(lit(1)).as("nnb"))
        .filter(col("nnb") + 1 >= 5).select(col("ai").as("id")).persist()
      phase("core")(core.count())
      val ce = nb
        .join(core.select(col("id").as("ai")), "ai")
        .join(core.select(col("id").as("bi")), "bi")
        .select(col("ai").as("src"), col("bi").as("dst"))
      phase("ce.count")(ce.count())
      val w2 = eps / 2
      val cw = core.join(pts.select(col("vec_id").as("id"), col("x"), col("y")), "id")
        .select(col("id"),
          floor(col("x") / w2).cast("long").as("gx"),
          floor(col("y") / w2).cast("long").as("gy"))
      val rep = cw.groupBy("gx", "gy").agg(min("id").as("rep"))
      val coreRep = cw.join(broadcast(rep), Seq("gx", "gy"))
        .select(col("id"), col("rep")).persist()
      phase("coreRep")(coreRep.count())
      val cEdges = ce
        .join(coreRep.select(col("id").as("src"), col("rep").as("rs")), "src")
        .join(coreRep.select(col("id").as("dst"), col("rep").as("rd")), "dst")
        .filter(col("rs") =!= col("rd"))
        .select(col("rs").as("src"), col("rd").as("dst")).distinct()
      val labels = phase("driverCC") {
        graft.ops.ConnectedComponents.driverComponents(
          rep.select(col("rep").as("node")), cEdges).get
      }
      val clab = coreRep
        .join(broadcast(labels.withColumnRenamed("node", "rep")), "rep")
        .select(col("id"), col("cid"))
        .persist()
      phase("clab")(clab.count())
      val blab = nb.join(core.select(col("id").as("ai")), Seq("ai"), "left_anti")
        .join(clab.select(col("id").as("bi"), col("cid")), "bi")
        .groupBy("ai").agg(min("cid").as("bcid"))
      val fin = pts.join(clab.select(col("id").as("vec_id"), col("cid")), Seq("vec_id"), "left")
        .join(blab.select(col("ai").as("vec_id"), col("bcid")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("cid").isNotNull, "core")
            .when(col("bcid").isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce(col("cid"), col("bcid"), lit(-1L)).as("cluster_id"))
        .orderBy("vec_id")
      phase("final assembly")(
        fin.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  private object Tables0 {
    def load(s: SparkSession, dir: String): DataFrame =
      graft.core.Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          element_at(col("embedding"), 1).cast("double").as("x"),
          element_at(col("embedding"), 2).cast("double").as("y"))
        .persist()
  }
}
