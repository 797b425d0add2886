package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the native as-of join operator
  * ([[graft.plans.AsOfJoinPlan]] / Exec / Strategy): backward ≤ match,
  * LEFT OUTER nulls, tie resolution by the right-side tiebreak order,
  * and multi-key merges across shuffle partitions. */
class AsOfJoinSpec extends AnyFunSuite {

  import TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)]) = {
    val l = left.toDF("k", "t")
    val r = right.toDF("rk", "rt", "v")
    graft.plans.AsOf.joinBackward(l, r,
        Seq("k"), Seq("rk"), "t", "rt", rightTie = Seq("v"))
      .select(col("k"), col("t"), col("rt"), col("v"))
      .as[(Long, Long, Option[Long], Option[String])]
      .collect().toSet
  }

  test("backward ≤ match, LEFT OUTER, ties resolve to last tiebreak") {
    val got = run(
      left = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)),
      right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (1L, 15L, "c"),
        (2L, 6L, "d"), (4L, 1L, "e")))
    assert(got == Set(
      (1L, 10L, Some(10L), Some("a")),   // equal time matches (≤)
      (1L, 20L, Some(15L), Some("c")),   // tie at rt=15 → last in v order
      (2L, 5L, None, None),              // only future right rows
      (3L, 7L, None, None)))             // key absent on the right
  }

  test("many keys across partitions; right rows never leak across keys") {
    val left = (1L to 50L).flatMap(k => Seq((k, 100L), (k, 300L)))
    val right = (1L to 50L).filter(_ % 2 == 0)
      .flatMap(k => Seq((k, 50L, s"$k-early"), (k, 200L, s"$k-late")))
    val got = run(left, right)
    (1L to 50L).foreach { k =>
      if (k % 2 == 0) {
        assert(got.contains((k, 100L, Some(50L), Some(s"$k-early"))))
        assert(got.contains((k, 300L, Some(200L), Some(s"$k-late"))))
      } else {
        assert(got.contains((k, 100L, None, None)))
        assert(got.contains((k, 300L, None, None)))
      }
    }
  }

  test("forward ≥ matches the FIRST following row; ties take first tiebreak") {
    val l = Seq((1L, 10L), (1L, 12L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "t")
    val r = Seq((1L, 10L, "a"), (1L, 15L, "b"), (1L, 15L, "c"),
      (2L, 6L, "d"), (4L, 1L, "e")).toDF("rk", "rt", "v")
    val got = graft.plans.AsOf.joinForward(l, r,
        Seq("k"), Seq("rk"), "t", "rt", rightTie = Seq("v"))
      .select(col("k"), col("t"), col("rt"), col("v"))
      .as[(Long, Long, Option[Long], Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, Some(10L), Some("a")),   // equal time matches (≥)
      (1L, 12L, Some(15L), Some("b")),   // tie at rt=15 → FIRST in v order
      (1L, 20L, None, None),             // nothing follows
      (2L, 5L, Some(6L), Some("d")),
      (3L, 7L, None, None)))
  }

  test("plan uses AsOfJoinExec with clustered exchanges, not a window") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, "x")).toDF("rk", "rt", "v")
    val df = graft.plans.AsOf.joinBackward(l, r, Seq("k"), Seq("rk"), "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
