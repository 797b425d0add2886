package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{MinHashSig, Text}

/** UDAF + sketch-aggregate coverage (SURVEY §2.5/§2.10 footnotes): ops
  * with no DuckDB-hash-comparable oracle are verified by property instead
  * — the typed Aggregator against its expression form, sketches against
  * exact counts. */
class AggregatorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("MinHashSig aggregator equals the k-min expression form on corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ex = docs.select(col("doc_id"),
      explode(Text.shingles(col("text"))).as("sh"))
      .select(col("doc_id"), Text.hash32(col("sh")).as("h"))

    // expression form: k separate mins
    val mins = Text.minhashParams.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % Text.minhashMod).as(s"m$i")
    }
    val viaExprs = ex.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (1 to Text.minhashParams.size).map(r.getLong))

    // one-pass typed Aggregator
    val sig = new MinHashSig().toColumn
    val viaAgg = ex.as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(sig).collect().sortBy(_._1)
      .map { case (id, arr) => id -> arr.toSeq }

    assert(viaAgg.toSeq == viaExprs.toSeq.map { case (id, s) => id -> s })
  }

  test("approx_count_distinct within its error bound of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val (approx, exact) = li.select(
      approx_count_distinct(col("l_partkey"), 0.02).as("a"),
      countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].collect().head
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val r = li.select(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap"),
      expr("percentile(l_extendedprice, 0.5)").as("ex"))
      .as[(Double, Double)].collect().head
    assert(math.abs(r._1 - r._2) / r._2 < 0.02, r.toString)
  }
}
