package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Vectors

class VectorsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f))
    ).toDF("a", "b")
    val r = df.select(round(Vectors.cosine(col("a"), col("b")), 9).as("c"))
      .as[Double].collect().toSeq
    assert(r == Seq(1.0, 0.0, -1.0))
  }

  test("dot accumulates in index order (deterministic)") {
    val df = Seq((Seq(0.5f, 2f, 4f), Seq(2f, 0.25f, 0.5f))).toDF("a", "b")
    val r = df.select(Vectors.dot(col("a"), col("b"))).as[Double].collect().head
    assert(r == 3.5)
  }

  test("native graft_cosine expression is bit-identical to the HOF form") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4).select(col("embedding").as("e2"))
    val mismatches = emb.crossJoin(q)
      .select((call_function("graft_cosine", col("embedding"), col("e2"))
        === Vectors.cosine(col("embedding"), col("e2"))).as("eq"))
      .filter(!col("eq")).count()
    assert(mismatches == 0)
  }

  test("graft_cosine/graft_dot accept double arrays, bit-identical to HOFs") {
    // the q56 shape: float corpus side × double learned-centroid side
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = emb.filter(col("vec_id") < 4)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)").as("e2"))
    val mismatches = emb.crossJoin(d)
      .select(
        (call_function("graft_cosine", col("embedding"), col("e2"))
          === Vectors.cosine(col("embedding"), col("e2"))).as("ceq"),
        (call_function("graft_dot", col("embedding"), col("e2"))
          === Vectors.dot(col("embedding"), col("e2"))).as("deq"))
      .filter(!col("ceq") || !col("deq")).count()
    assert(mismatches == 0)
    // double × double side as well
    val dd = spark.range(1).select(
      call_function("graft_dot",
        expr("array(CAST(0.5 AS DOUBLE), CAST(2.0 AS DOUBLE))"),
        expr("array(CAST(2.0 AS DOUBLE), CAST(0.25 AS DOUBLE))")))
      .as[Double].collect().head
    assert(dd == 1.5)
  }
}
