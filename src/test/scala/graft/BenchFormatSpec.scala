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
    val results = names.map(_ -> 1234.567).toMap // worst-case width values
    val line = Bench.formatLine(results, Nil, "/root/testdata/sf0.1")
    assert(line.length < 1800, s"bench JSON line is ${line.length} chars " +
      s"for ${names.size} queries — shrink keys/precision before the " +
      "driver's 2000-char tail (minus the sbt suffix) truncates it")
  }

  test("qNN key prefixes are unique across the query set") {
    val names = SparkEntry.queries.keys.toSeq
    val prefixes = names.map(_.split("_").head)
    assert(prefixes.distinct.size == names.size,
      s"duplicate short keys: ${prefixes.diff(prefixes.distinct).distinct}")
  }

  test("a failed query reports -1, never a huge or misleading number") {
    val line = Bench.formatLine(
      Map("q01_x" -> Double.MaxValue, "q02_y" -> 1.0), Seq("q01_x"), "sf")
    assert(line.contains("\"01\":-1") && line.contains("\"failed\":[\"q01_x\"]"))
  }
}
