package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text

class TextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("hash32: fused native expression is bit-identical to the composed md5 form") {
    // the composed form IS the oracle contract
    // (CAST('0x'||substr(md5(x),1,8) AS BIGINT)); the Hash32 Expression
    // must never diverge from it — over real corpus tokens plus edge
    // strings (empty, unicode, long)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(lower(col("text")), " ")).as("s"))
      .union(Seq("", "é—ü", "x" * 5000, "\\N", "0").toDF("s"))
    val mismatches = docs.select(
        Text.hash32(col("s")).as("fused"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("composed"))
      .filter(col("fused") =!= col("composed")).count()
    assert(mismatches == 0)
  }

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

  private def chunksOf(texts: String*): Seq[Seq[String]] = {
    val df = texts.toDF("text")
      .select(Text.tokens(lower(col("text"))).as("tk"))
      .select(col("tk"), Text.cdcBoundaries(col("tk"), 3).as("bpos"))
      .select(filter(Text.cdcChunks(col("tk"), col("bpos")),
        c => c.getField("e") >= c.getField("s") && c.getField("chunk") =!= "")
        .as("cs"))
      .select(transform(col("cs"), c => c.getField("chunk")).as("chunks"))
    df.as[Seq[String]].collect().toSeq
  }

  test("cdc chunks: reassembly covers the document exactly") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val Seq(cs) = chunksOf(text)
    assert(cs.size > 1) // mod=3 must cut a 20-token doc at least once
    assert(cs.mkString(" ") == text)
  }

  test("cdc chunks: shift-invariant — an early insertion leaves the tail aligned") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten"
    val edited = "INSERTED " + base
    val Seq(orig, mod) = chunksOf(base, edited)
    // content-defined boundaries re-align after the chunk containing the
    // edit: the trailing chunks must match verbatim, with at most the
    // first chunk differing (a fixed-width splitter would misalign all)
    val commonSuffix = orig.reverse.zip(mod.reverse)
      .takeWhile { case (a, b) => a == b }.size
    assert(orig.size > 2, s"need several chunks, got $orig")
    assert(commonSuffix >= orig.size - 1,
      s"suffix $commonSuffix of ${orig.size}: $orig vs $mod")
  }
}
