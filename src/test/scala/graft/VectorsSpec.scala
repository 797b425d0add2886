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
}
