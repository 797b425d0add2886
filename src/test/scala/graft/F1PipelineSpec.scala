package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.etl.F1Pipeline

/** Golden end-to-end test of the reference's ETL surface (SURVEY §5.4):
  * wide CSV (with `\N` sentinels, malformed dates/times, duplicate keys,
  * quote-embedded values) → 16 star tables. Fixture cases mirror
  * FIXTURES.md §B's malformed-input list. */
class F1PipelineSpec extends AnyFunSuite {
  import TestSpark.spark

  // Fixture rows + pipeline output shared with the sink specs.
  private def tables = F1Fixture.tables
  private def csvPath = F1Fixture.csvPath

  private def rows(t: String): Seq[Row] = tables(t).collect().toSeq

  test("DateDimension: distinct dates desc with calendar split") {
    assert(rows("DateDimension").map(r => (r.getDate(0).toString, r.getInt(1), r.getInt(2), r.getInt(3)))
      == Seq(("2021-05-09", 9, 5, 2021), ("2021-05-02", 2, 5, 2021)))
  }

  test("LocationDimension: keep-first wins on duplicate circuitId") {
    val m = rows("LocationDimension").map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m == Map(1 -> "Circuit A", 2 -> "Circuit B"))
  }

  test("Driver: invalid dob dropped, age derived, rename applied") {
    val d = rows("Driver").map(r => (r.getInt(0), r.getInt(10))) // driverId, age
    assert(d == Seq((1, 36), (3, 26)))
    assert(tables("Driver").columns.contains("url_driver"))
  }

  test("TimeDimension: F9 gap + absolute resolution; both-null rows skipped") {
    val m = rows("TimeDimension")
      .map(r => (r.getInt(0), (r.getString(1), r.getString(2)))).toMap
    assert(m == Map(
      100 -> (("00:00:17.123", "14:00:05.000")),
      102 -> (("01:31:44.904", "00:01:02.456"))))
  }

  test("Sprint: quote-stripped parses; null sprint_date rows dropped") {
    val m = rows("Sprint")
      .map(r => (r.getInt(0), (r.getDate(1).toString, r.getString(2)))).toMap
    assert(m == Map(
      100 -> (("2021-05-01", "14:30:00")),
      102 -> (("2021-05-01", "14:30:00"))))
  }

  test("FreePractice: all-six-null row dropped") {
    assert(rows("FreePractice").map(_.getInt(0)) == Seq(100, 102))
  }

  test("Qualification: sentinel position → 0, valid parses kept") {
    val m = rows("Qualification").map(r => ((r.getInt(0), r.getInt(1)), r.getInt(4))).toMap
    assert(m == Map((100, 1) -> 0, (101, 2) -> 5, (102, 3) -> 7))
  }

  test("Laps: composite dedup keeps first; µs lap time truncated to ms") {
    val m = rows("Laps").map(r => (r.getInt(0), (r.getString(4), r.getInt(5)))).toMap
    assert(m(100) == (("00:01:02.345", 1))) // r1 beat r2 (position 1, not 9)
    assert(m(101) == (("01:02:03.456", 1)))
  }

  test("PitStop: guarded time parse + permissive duration cast") {
    val m = rows("PitStop").map(r => (r.getInt(0), Option(r.get(5)))).toMap
    assert(m(100) == Some(22.0))
    assert(m(101) == None) // 'abc' coerced to NULL
  }

  test("Results: F11 speed cast NULL on sentinel; F8 fastest lap parsed") {
    val m = rows("Results")
      .map(r => (r.getInt(0), (Option(r.get(9)), Option(r.get(10))))).toMap
    assert(m(1000) == ((Some("00:01:12.909"), Some(207.235))))
    assert(m(1001) == ((None, None)))
  }

  test("Standings: identity re-projection with dedup") {
    assert(rows("DriverStandings").map(_.getInt(0)) == Seq(500, 501, 502))
    assert(rows("TeamStandings").map(_.getInt(0)) == Seq(600, 601, 602))
    assert(tables("TeamStandings").columns.contains("race_id"))
  }

  test("Laps/PitStop: DDL surrogate keys present, contiguous, sort-ordered") {
    // the reference's SEQ_laps_id / SEQ_pits_id defaults
    // (`DDL Final.sql:75-87,234,251`)
    val l = tables("Laps").orderBy("raceId", "driver_id", "lap")
      .select("lapsId").collect().map(_.getInt(0)).toSeq
    assert(l == (1 to l.size), s"lapsId not contiguous in sort order: $l")
    val p = tables("PitStop").orderBy("race_id", "driver_id", "stop_number")
      .select("pitsId").collect().map(_.getLong(0)).toSeq
    assert(p == (1L to p.size.toLong),
      s"pitsId not contiguous in sort order: $p")
  }

  test("CircuitLocation: declared-but-unloaded DDL table stubbed, typed") {
    val cl = tables("CircuitLocation")
    assert(cl.count() == 0)
    assert(cl.columns.toSeq == Seq("circuit_key", "circuit_short_name",
      "country_code", "country_key", "country_name"))
  }

  test("Race + referential integrity: every FK resolves (J2 anti-join empty)") {
    import graft.ops.Integrity
    assert(rows("Race").map(_.getInt(0)) == Seq(100, 101, 102))
    val orphans = Integrity.orphans(
      tables("Race").withColumnRenamed("locationId", "locationId"),
      tables("LocationDimension"), Seq("locationId"))
    assert(orphans.count() == 0)
  }

  test("run: the one-call daily job writes all 16 tables, idempotently") {
    val expected = tables.keySet // forces the fixture (sets csvPath)
    val out = Files.createTempDirectory("f1out").toString
    F1Pipeline.run(spark, csvPath, out)
    F1Pipeline.run(spark, csvPath, out) // rerun == the reference's @daily
    val written = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(written == expected, s"missing: ${expected -- written}")
    assert(spark.read.parquet(s"$out/DateDimension").count() == 2)
    assert(spark.read.parquet(s"$out/Results").count()
      == tables("Results").count())
  }
}
