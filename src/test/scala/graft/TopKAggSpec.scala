package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** graft_topk (TypedImperativeAggregate): heap mechanics, partial/merge
  * correctness at forced parallelism, and the bounded-state claim. */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark.spark

  test("heap keeps exactly the k largest, order-canonical, any insert order") {
    val vals = Seq(5.0, 1.0, 9.0, 7.0, 3.0, 9.0, 2.0)
    for (perm <- vals.permutations.take(50)) {
      val h = new TopKAgg.Heap(3)
      perm.foreach(h.offer)
      assert(h.sortedDesc().toSeq == Seq(9.0, 9.0, 7.0),
        s"wrong top-3 for insert order $perm")
    }
  }

  test("k larger than input returns everything; k=1 returns the max") {
    val h = new TopKAgg.Heap(10)
    Seq(2.0, 8.0, 4.0).foreach(h.offer)
    assert(h.sortedDesc().toSeq == Seq(8.0, 4.0, 2.0))
    val h1 = new TopKAgg.Heap(1)
    Seq(2.0, 8.0, 4.0).foreach(h1.offer)
    assert(h1.sortedDesc().toSeq == Seq(8.0))
  }

  test("aggregate equals the window form under forced 32-way parallelism") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // Values engineered so every partition holds candidates.
    val df = (1 to 5000).map(i => ((i % 7).toString, (i * 37 % 4999).toDouble))
      .toDF("g", "v").repartition(32)
    df.createOrReplaceTempView("topk_in")
    val agg = spark.sql(
      """SELECT g, tk FROM (SELECT g, graft_topk(v, 5) AS tk
        |FROM topk_in GROUP BY g)""".stripMargin)
      .selectExpr("g", "posexplode(tk) AS (pos, v)")
      .select(col("g"), col("pos"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    val win = spark.sql(
      """SELECT g, CAST(rn - 1 AS INT) AS pos, v FROM (
        |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        |  FROM topk_in) WHERE rn <= 5""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(agg == win, "graft_topk diverged from the window top-k")
  }

  test("serialize/deserialize round-trips the buffer") {
    val h = new TopKAgg.Heap(4)
    Seq(3.5, -1.0, 7.25, 0.0, 9.125).foreach(h.offer)
    val e = TopKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
    val back = e.deserialize(e.serialize(h))
    assert(back.sortedDesc().toSeq == h.sortedDesc().toSeq)
    assert(back.k == 4)
  }

  test("plan carries a partial aggregate (bounded per-map-task state)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("g", "v")
      .repartition(8)
      .groupBy("g").agg(expr("graft_topk(v, 2)").as("tk"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk") ||
      "ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation for graft_topk:\n$p")
  }
}
