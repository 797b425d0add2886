package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.plans.MvRewriteRule

/** MV-rewrite rule mechanics beyond what q336's in-query `require` and
  * oracle already prove: the rule must also KNOW ITS LIMITS — aggregates
  * it cannot serve exactly (avg, distinct, filtered) and plans with a
  * filter between aggregate and scan must keep the base plan. */
class MvRewriteSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = java.nio.file.Files
    .createTempDirectory("graft_mvspec").toString
  private val basePath = s"$dir/base"
  private val mvPath = s"$dir/mv"

  private val rule: MvRewriteRule = {
    import spark.implicits._
    (1 to 100).map(i => (i % 3, i % 5, i.toLong, BigDecimal(i).setScale(2)))
      .toDF("g1", "g2", "x", "d")
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    base.groupBy("g1", "g2")
      .agg(sum("x").as("s_x"), sum("d").as("s_d"),
        sum(col("x").cast("decimal(20,2)")).as("s_xc"),
        count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(mvPath)
    val bp = base.queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.head.toString
    }.get
    MvRewriteRule(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      bp, spark.read.parquet(mvPath).queryExecution.analyzed,
      Set("g1", "g2"),
      Map("x" -> "s_x", "d" -> "s_d", "x#decimal(20,2)" -> "s_xc"), "n")
  }

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[String] =
    rule(df.queryExecution.optimizedPlan).collect {
      case l: LogicalRelation => l.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.head.toString
    }

  test("subsumed aggregate is redirected to the MV, values intact") {
    val q = spark.read.parquet(basePath).groupBy("g1")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
    assert(scans(q).forall(_.endsWith("/mv")), s"still on base: ${scans(q)}")
    val direct = q.orderBy("g1").collect().toSeq
    val served = org.apache.spark.sql.GraftSqlBridge
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        rule(q.orderBy("g1").queryExecution.optimizedPlan))
      .collect().toSeq
    assert(served == direct)
  }

  test("cast-wrapped aggregates (CollapseProject shape) still rewrite") {
    val q = spark.read.parquet(basePath).groupBy("g1", "g2")
      .agg(sum("d").as("sd"))
      .select(col("g1"), col("g2"), col("sd").cast("decimal(28,2)").as("sd"))
    assert(scans(q).forall(_.endsWith("/mv")))
  }

  test("a DECLARED sum-of-cast is served; an undeclared cast is not") {
    val base = spark.read.parquet(basePath)
    val declared = base.groupBy("g1")
      .agg(sum(col("x").cast("decimal(20,2)")).as("sxc"))
    assert(scans(declared).forall(_.endsWith("/mv")))
    val undeclared = base.groupBy("g1")
      .agg(sum(col("x").cast("decimal(21,3)")).as("sxc"))
    assert(scans(undeclared).forall(_.endsWith("/base")))
  }

  test("avg / distinct / filtered aggregates keep the base plan") {
    val base = spark.read.parquet(basePath)
    assert(scans(base.groupBy("g1").agg(avg("x"))).forall(_.endsWith("/base")))
    assert(scans(base.groupBy("g1").agg(sum_distinct(col("x"))))
      .forall(_.endsWith("/base")))
    assert(scans(base.groupBy("g1")
        .agg(sum(when(col("g2") > 2, col("x")))))
      .forall(_.endsWith("/base")))
  }

  test("a filter between aggregate and scan keeps the base plan") {
    val q = spark.read.parquet(basePath).filter(col("g2") > 1)
      .groupBy("g1").agg(sum("x"))
    assert(scans(q).forall(_.endsWith("/base")))
  }

  test("grouping by a non-MV column keeps the base plan") {
    val q = spark.read.parquet(basePath).groupBy("x").agg(count(lit(1)))
    assert(scans(q).forall(_.endsWith("/base")))
  }
}
