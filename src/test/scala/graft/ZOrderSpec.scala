package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** The native Morton expression behind q286: the mask-shift ladder must
  * equal the definitional bit loop, the registered expression must equal
  * the static helper under codegen, and the curve must have the
  * quadrant-recursive prefix property that makes z-sorting cluster 2-D
  * space (the reason OPTIMIZE ZORDER works at all). */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def reference(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("mask-shift ladder equals the definitional bit loop on 20k coords " +
      "(incl. corners), and the SQL generator agrees term-for-term") {
    val rnd = new scala.util.Random(42)
    val corners = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val cases = corners ++ (0 until 20000).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    cases.foreach { case (x, y) =>
      assert(ZOrder.interleave2(x, y) == reference(x, y), s"($x, $y)")
    }
    // the generated SQL is Spark-parseable and computes the same curve
    val df = cases.take(512).toDF("x", "y")
    df.selectExpr("x", "y", ZOrder.sql("x", "y") + " AS zs")
      .withColumn("zn", call_function("graft_zorder2", col("x"), col("y")))
      .collect().foreach { r =>
        assert(r.getLong(2) == r.getLong(3),
          s"SQL form diverges at (${r.getLong(0)}, ${r.getLong(1)})")
      }
  }

  test("quadrant-recursive prefix: the top two z bits are the top y/x " +
      "bits, so each z-sorted half stays within one half-plane") {
    val rnd = new scala.util.Random(7)
    (0 until 5000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      val z = ZOrder.interleave2(x, y)
      assert(((z >> 31) & 1L) == ((y >> 15) & 1L))
      assert(((z >> 30) & 1L) == ((x >> 15) & 1L))
    }
  }

  test("expression runs inside whole-stage codegen (no fallback)") {
    val df = spark.range(64)
      .select(call_function("graft_zorder2", col("id"),
        col("id") * 3 % 65536).as("z"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix is the WholeStageCodegen marker in the
    // simple plan string — the expression must sit INSIDE a starred span
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_zorder2") && l.trim.startsWith("*(")),
      s"graft_zorder2 not inside a codegen span:\n$plan")
    assert(df.agg(max("z")).head().getLong(0) > 0)
  }
}
