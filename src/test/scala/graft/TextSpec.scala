package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text

class TextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("tokenCount handles multi-space and padding") {
    val df = Seq("  the  quick   fox ").toDF("text")
    assert(df.select(Text.tokenCount(col("text"))).as[Int].collect().head == 3)
  }

  test("shingles: n-grams in order; short docs yield empty array") {
    val df = Seq("a b c d").toDF("text")
    val sh = df.select(Text.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect().head
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Text.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect().head
    assert(short.isEmpty)
  }

  test("fingerprint is whitespace/case-invariant") {
    val df = Seq(("The  Fox", "the fox")).toDF("a", "b")
    val r = df.select(
      (Text.fingerprint(col("a")) === Text.fingerprint(col("b"))).as("eq"))
      .as[Boolean].collect().head
    assert(r)
  }

  test("langId picks marker-dominant language with fixed tie-break") {
    val df = Seq("der und die haus", "xyzzy qwerty", "the cat and dog")
      .toDF("text")
    val r = df.select(Text.langId(col("text"))).as[String].collect().toSeq
    assert(r == Seq("de", "und", "en"))
  }

  test("stopword and punct counts") {
    val df = Seq("the fox, quick!").toDF("text")
    val r = df.select(
      Text.stopwordCount(col("text")).as("s"),
      Text.punctCount(col("text")).as("p"))
      .as[(Int, Int)].collect().head
    assert(r == ((1, 2)))
  }
}
