package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's JSON line out of the LAST 2000 chars of
  * stdout; sbt's trailing "[success] Total time ..." line eats ~80 of
  * them. This spec fails the build if the line for the CURRENT query
  * set (worst-case 4-digit-second values) ever outgrows the budget —
  * rounds 1-3 lost their bench numbers exactly this way. */
class BenchFormatSpec extends AnyFunSuite {

  test("bench JSON line fits the driver's 2000-char tail with headroom") {
    val names = SparkEntry.queries.keys.toSeq
    // Worst-case width values only: 9.94 → "9.9" and 1234.567 → "999"
    // both render the 3-char bound. (Do NOT mix in 10–99 s values —
    // they render 2 chars and would under-measure the line.)
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> Seq(9.94, 1234.567)(i % 2) }.toMap
    val line = Bench.formatLine(results, Nil, "/root/testdata/sf0.1",
      loadStart = 31.0, loadEnd = 33.0) // the load marker costs tail too
    // Budget: the JSON line is printed LAST by the forked JVM (bare, via
    // StdoutOutput); the only stdout after it is sbt's own
    // "[success] Total time: ..." line, measured ≈75 chars, plus
    // newlines — so the HARD ceiling is ~1920 of the driver's 2000-char
    // tail. Since the map is top-40 + "rest", the line is bounded at
    // any query count; assert far below the ceiling so failures mean a
    // real format regression, not query growth.
    assert(line.length < 1200, s"bench JSON line is ${line.length} chars " +
      s"for ${names.size} queries — the top-40+rest map should bound " +
      "this at any query count (hard ceiling: ~1920 of the 2000 tail)")
  }

  test("every failed query appears in the line regardless of rank; " +
      "rest sums the unshown remainder") {
    val results = (1 to 60).map(i => f"q$i%02d_x" -> i.toDouble).toMap +
      ("q99_fail" -> Double.MaxValue)
    val line = Bench.formatLine(results, Seq("q99_fail"), "sf0.1")
    assert(line.contains("\"99\":-1"), s"failed query missing: $line")
    // top-40 of 60 leaves 1..20 unshown: rest = 210.00
    assert(line.contains("\"rest\":210.00"), s"wrong rest: $line")
    assert(!line.contains("\"20\":") && line.contains("\"21\":"),
      s"top-40 cut misplaced: $line")
  }

  test("qNN key prefixes are unique across the query set") {
    val names = SparkEntry.queries.keys.toSeq
    // The emitted key is the digits with leading zeros stripped — assert
    // uniqueness of what actually lands in the JSON map.
    val keys = names.map(_.split("_").head.stripPrefix("q").dropWhile(_ == '0'))
    assert(keys.distinct.size == names.size,
      s"duplicate short keys: ${keys.diff(keys.distinct).distinct}")
  }

  test("a failed query reports -1, never a huge or misleading number") {
    val line = Bench.formatLine(
      Map("q01_x" -> Double.MaxValue, "q02_y" -> 1.0), Seq("q01_x"), "sf")
    assert(line.contains("\"1\":-1") && line.contains("\"failed\":[\"q01_x\"]"))
  }
}
