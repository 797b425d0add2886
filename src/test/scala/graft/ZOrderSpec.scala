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

  test("Hilbert: d2xy/xy2d round-trip over the full order-8 subgrid and " +
      "sampled order-16 positions; consecutive positions are always " +
      "grid-adjacent (the locality claim q361 measures)") {
    import graft.functions.Hilbert
    // unit-step adjacency along the curve: |dx|+|dy| == 1 — Morton
    // fails this at every power-of-two boundary, Hilbert never does
    var d = 0L
    var (px, py) = Hilbert.d2xy(0L)
    while (d < 65535L) {
      d += 1
      val (x, y) = Hilbert.d2xy(d)
      assert(math.abs(x - px) + math.abs(y - py) == 1,
        s"jump at d=$d: ($px,$py) -> ($x,$y)")
      px = x; py = y
    }
    // round trip, including the corners of the full 16-bit grid
    val rnd = new scala.util.Random(11)
    val cases = Seq(0L, 1L, (1L << 32) - 1, 1L << 31) ++
      (0 until 20000).map(_ => rnd.nextLong((1L << 32)))
    cases.foreach { dd =>
      val (x, y) = Hilbert.d2xy(dd)
      assert(Hilbert.xy2d(x, y) == dd, s"round trip failed at d=$dd")
    }
  }

  test("Hilbert SQL CTE (the oracle form) equals the native expression") {
    import graft.functions.Hilbert
    val rnd = new scala.util.Random(23)
    val cases = (0 until 256).map(i =>
      (i.toLong, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = cases.toDF("key", "x", "y")
    df.createOrReplaceTempView("hspec_pts")
    // Spark also executes recursive CTEs (q352) — run the GENERATED
    // oracle loop in Spark's dialect and compare to the native expression
    val viaCte = spark.sql(
      s"""WITH RECURSIVE src AS (SELECT key, x, y FROM hspec_pts),
         |${Hilbert.sqlCte("src", intDiv = "DIV", xor = (a, b) => s"(($a) ^ ($b))")}
         |SELECT key, d FROM hd""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (k, x, y) =>
      assert(viaCte(k) == Hilbert.xy2d(x, y),
        s"CTE form diverges at key=$k ($x, $y)")
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
