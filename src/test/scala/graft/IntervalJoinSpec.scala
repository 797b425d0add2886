package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Interval

/** The native interval-overlap operator (plans/IntervalJoin.scala)
  * against a brute-force predicate join of the same definition, plus
  * the physical claims: one exchange per side, sweep state bounded by
  * concurrency, nulls never match. */
class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def brute(l: Seq[(Long, Long, Long, Long)],
      r: Seq[(Long, Long, Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      (lk, llo, lhi, lid) <- l
      (rk, rlo, rhi, rid) <- r
      if lk == rk && rlo <= lhi && rhi >= llo
    } yield (lk, lid, rid)).toSet

  test("matches a brute-force overlap join on 2k random intervals, " +
      "forced through 32 partitions") {
    val rnd = new scala.util.Random(41)
    def gen(n: Int) = (0 until n).map { i =>
      val k = rnd.nextInt(20).toLong
      val lo = rnd.nextInt(1000).toLong
      (k, lo, lo + rnd.nextInt(80).toLong, i.toLong)
    }
    val l = gen(1000); val r = gen(1000)
    val lDf = l.toDF("k", "lo", "hi", "lid").repartition(32)
    val rDf = r.toDF("rk", "rlo", "rhi", "rid").repartition(32)
    val got = Interval.join(lDf, rDf, Seq("k"), Seq("rk"),
        "lo", "hi", "rlo", "rhi", Seq("lid"), Seq("rid"))
      .select(col("k"), col("lid"), col("rid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(l, r),
      s"missing=${(brute(l, r) -- got).take(5)} extra=${(got -- brute(l, r)).take(5)}")
  }

  test("plan shape: one hash exchange per side, no extra shuffle, " +
      "IntervalJoinExec in the executed plan") {
    val lDf = (0L until 100L).map(i => (i % 4, i, i + 5)).toDF("k", "lo", "hi")
    val rDf = (0L until 100L).map(i => (i % 4, i + 2, i + 3)).toDF("k", "lo", "hi")
    val j = Interval.join(lDf, rDf, Seq("k"), Seq("k"),
      "lo", "hi", "lo", "hi")
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), s"native exec missing:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
    assert(j.count() > 0)
  }

  test("null keys group; null endpoints never match") {
    val l = Seq((Some(1L), Some(0L), Some(10L), 1L),
      (Some(1L), None, Some(10L), 2L),
      (None: Option[Long], Some(0L), Some(10L), 3L))
      .toDF("k", "lo", "hi", "lid")
    val r = Seq((Some(1L), Some(5L), Some(6L), 10L),
      (Some(1L), Some(5L), None: Option[Long], 11L),
      (None: Option[Long], Some(5L), Some(6L), 12L))
      .toDF("k", "lo", "hi", "rid")
    val got = Interval.join(l, r, Seq("k"), Seq("k"),
        "lo", "hi", "lo", "hi", Seq("lid"), Seq("rid"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // null-key rows group together (documented deviation from SQL
    // equi-join); null endpoints are never eligible on either side
    assert(got == Set((1L, 10L), (3L, 12L)))
  }

  test("left outer: unmatched and null-endpoint left rows emit once, " +
      "null-padded; matched rows are identical to the inner form") {
    val rnd = new scala.util.Random(59)
    def gen(n: Int) = (0 until n).map { i =>
      val k = rnd.nextInt(10).toLong
      val lo = rnd.nextInt(500).toLong
      (k, lo, lo + rnd.nextInt(40).toLong, i.toLong)
    }
    val l = gen(400); val r = gen(200)
    val lDf = l.toDF("k", "lo", "hi", "lid").repartition(16)
    val rDf = r.toDF("rk", "rlo", "rhi", "rid").repartition(16)
    val outer = graft.plans.Interval.join(lDf, rDf, Seq("k"), Seq("rk"),
        "lo", "hi", "rlo", "rhi", Seq("lid"), Seq("rid"), leftOuter = true)
      .select(col("lid"), col("rid"))
      .as[(Long, Option[Long])].collect()
    val matched = brute(l, r).map { case (_, lid, rid) => (lid, Some(rid)) }
    val matchedLids = matched.map(_._1)
    val want = matched ++
      l.map(_._4).filterNot(matchedLids).map(lid => (lid, None))
    assert(outer.toSet == want,
      s"missing=${(want -- outer.toSet).take(5)} extra=${(outer.toSet -- want).take(5)}")
    // every left row appears at least once
    assert(outer.map(_._1).distinct.length == l.length)
  }

  test("touching endpoints match (closed intervals); disjoint do not") {
    val l = Seq((1L, 0L, 5L, 1L)).toDF("k", "lo", "hi", "lid")
    val r = Seq((1L, 5L, 9L, 10L), (1L, 6L, 9L, 11L))
      .toDF("k", "lo", "hi", "rid")
    val got = Interval.join(l, r, Seq("k"), Seq("k"),
        "lo", "hi", "lo", "hi")
      .select("rid").as[Long].collect().toSet
    assert(got == Set(10L))
  }
}
