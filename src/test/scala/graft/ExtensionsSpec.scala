package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** graft.plans.BandedLevenshteinRule via SparkSessionExtensions: the
  * rewrite must fire on user-written threshold predicates and must not
  * change results (the -1 contract of the banded form). */
class ExtensionsSpec extends AnyFunSuite {

  // A second session over the SAME SparkContext, with extensions — the
  // shared TestSpark session must stay untouched, so clear the
  // active/default registrations around the builder call and restore.
  private lazy val ext: SparkSession = {
    val base = TestSpark.spark // force init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def bandedCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l: Levenshtein if l.threshold.isDefined => l
    }).size

  test("lev(a,b) <= k rewrites to the banded form and keeps results") {
    import ext.implicits._
    // parquet-backed: a LocalRelation would be constant-folded away
    // before the plan could be inspected
    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
    Seq(("kitten", "sitting"), ("abc", "abd"), ("abc", "zzzzzzzzzz"))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = ext.read.parquet(dir)
    val q = df.filter(levenshtein(col("a"), col("b")) <= 2)
    assert(bandedCount(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(q.select("a", "b").collect().map(_.getString(0)).toSeq == Seq("abc"))
    // strict < and literal-on-left forms rewrite too
    assert(bandedCount(df.filter(levenshtein(col("a"), col("b")) < 4)) == 1)
    assert(bandedCount(df.filter(lit(3) >= levenshtein(col("a"), col("b")))) == 1)
    // projection of the raw distance is NOT a comparison — left alone
    assert(bandedCount(df.select(levenshtein(col("a"), col("b")).as("d"))) == 0)
  }

  test("rewrite preserves exact distances and null semantics") {
    import ext.implicits._
    val df = Seq(("kitten", Some("sitting")), ("abc", Some("abd")),
      ("x", None)).toDF("a", "b")
    // threshold exactly at the distance boundary: lev(kitten,sitting)=3
    val kept = df.filter(levenshtein(col("a"), col("b")) <= 3)
      .select("a").collect().map(_.getString(0)).toSeq.sorted
    assert(kept == Seq("abc", "kitten")) // null comparison drops the None row
    // plain session (no extensions) agrees
    val plainKept = {
      val s = TestSpark.spark
      import s.implicits._
      Seq(("kitten", Some("sitting")), ("abc", Some("abd")), ("x", None))
        .toDF("a", "b")
        .filter(levenshtein(col("a"), col("b")) <= 3)
        .select("a").collect().map(_.getString(0)).toSeq.sorted
    }
    assert(kept == plainKept)
  }
}
