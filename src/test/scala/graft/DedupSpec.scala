package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Keep-first dedup semantics (SURVEY §2.3 D1–D3): pandas keeps the first
  * row in current order; our window form must do the same under an
  * explicit total order — including the duplicate-composite-key fixtures
  * from FIXTURES.md §B (laps_etl.py:34-56, pitstop.py:26-55 analogs). */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("keepFirst keeps first row in sort order per key") {
    val df = Seq(
      (1, "2024-01-03", "late"),
      (1, "2024-01-01", "first"),
      (1, "2024-01-02", "mid"),
      (2, "2024-05-05", "only")
    ).toDF("k", "d", "tag")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("d").asc))
      .orderBy("k").select("tag").as[String].collect()
    assert(out.toSeq == Seq("first", "only"))
  }

  test("keepFirst on composite key") {
    val df = Seq(
      (1, 10, 3, "c"), (1, 10, 1, "a"), (1, 10, 2, "b"), (1, 20, 1, "x")
    ).toDF("race", "driver", "ord", "tag")
    val out = Dedup.keepFirst(df, Seq("race", "driver"), Seq(col("ord").asc))
      .orderBy("driver").select("tag").as[String].collect()
    assert(out.toSeq == Seq("a", "x"))
  }

  test("keepFirst is idempotent") {
    val df = Seq((1, 2, "a"), (1, 1, "b"), (2, 1, "c")).toDF("k", "o", "t")
    val once = Dedup.keepFirst(df, Seq("k"), Seq(col("o").asc))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("o").asc))
    assert(once.orderBy("k", "o").collect().toSeq ==
      twice.orderBy("k", "o").collect().toSeq)
  }

  test("distinctRows removes exact duplicates only") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "v")
    assert(Dedup.distinctRows(df).count() == 2)
  }
}
