package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.core.Tables
import graft.etl.{F1Pipeline, F1Schema}

/** Golden end-to-end test of the reference's ETL surface (SURVEY §5.4):
  * wide CSV (with `\N` sentinels, malformed dates/times, duplicate keys,
  * quote-embedded values) → 15 star tables. Fixture cases mirror
  * FIXTURES.md §B's malformed-input list. */
class F1PipelineSpec extends AnyFunSuite {
  import TestSpark.spark

  private val cols = F1Schema.wide.fields.map(_.name)

  private val defaults: Map[String, String] = Map(
    "date" -> "2021-05-02",
    "circuitId" -> "1", "circuitRef" -> "monaco", "name_x" -> "Circuit A",
    "location" -> "Loc", "country" -> "X", "lat" -> "1.5", "lng" -> "2.5",
    "url_x" -> "http://a",
    "statusId" -> "1", "status" -> "Finished",
    "driverId" -> "1", "forename" -> "Max", "surname" -> "V",
    "dob" -> "1990-12-31", "nationality" -> "NL", "url" -> "http://d",
    "number" -> "33", "constructorRef" -> "rb", "driverRef" -> "max",
    "code" -> "VER",
    "constructorId" -> "10", "name" -> "RB",
    "nationality_constructors" -> "AT", "url_constructors" -> "http://t",
    "raceId" -> "100", "round" -> "1",
    "fp1_date" -> "2021-04-30", "fp1_time" -> "11:00:00",
    "fp2_date" -> "2021-04-30", "fp2_time" -> "15:00:00",
    "fp3_date" -> "2021-05-01", "fp3_time" -> "12:00:00",
    "stop" -> "1", "lap_pitstops" -> "12", "time_pitstops" -> "15:03:20",
    "duration" -> "22.0", "milliseconds_pitstops" -> "22000",
    "quali_date" -> "2021-05-01", "quali_time" -> "14:00:00",
    "position" -> "\\N",
    "driverStandingsId" -> "500", "points_driverstandings" -> "25.0",
    "position_driverstandings" -> "1", "wins" -> "1",
    "sprint_date" -> "'2021-05-01'", "sprint_time" -> "'14:30:00'",
    "constructorStandingsId" -> "600", "points_constructorstandings" -> "40.0",
    "position_constructorstandings" -> "1", "wins_constructorstandings" -> "1",
    "time" -> "+17.123", "time_races" -> "14:00:05",
    "resultId" -> "1000", "positionOrder" -> "1", "points" -> "25.0",
    "laps" -> "66", "grid" -> "1", "rank" -> "1", "fastestLap" -> "60",
    "fastestLapTime" -> "1:12.909", "fastestLapSpeed" -> "207.235",
    "lap" -> "1", "time_laptimes" -> "1:02.345", "position_laptimes" -> "1",
    "milliseconds_laptimes" -> "62345")

  private def row(over: (String, String)*): String = {
    val m = defaults ++ over
    cols.map(m(_)).mkString(",")
  }

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    val r1 = row() // fully valid
    val r2 = row( // duplicate keys of r1, different payload → must lose
      "name_x" -> "Circuit A2", "status" -> "Retired2", "surname" -> "V2",
      "name" -> "RB2", "position_laptimes" -> "9")
    val r3 = row( // second key set, heavy on \N and junk
      "raceId" -> "101", "date" -> "2021-05-09",
      "circuitId" -> "2", "name_x" -> "Circuit B",
      "statusId" -> "2", "status" -> "Retired",
      "driverId" -> "2", "dob" -> "\\N", "driverRef" -> "xx",
      "surname" -> "B", "number" -> "\\N",
      "constructorId" -> "11", "name" -> "AM",
      "resultId" -> "1001", "driverStandingsId" -> "501",
      "constructorStandingsId" -> "601",
      "fp1_date" -> "\\N", "fp1_time" -> "\\N", "fp2_date" -> "\\N",
      "fp2_time" -> "\\N", "fp3_date" -> "\\N", "fp3_time" -> "\\N",
      "sprint_date" -> "\\N", "sprint_time" -> "\\N",
      "time" -> "\\N", "time_races" -> "\\N",
      "quali_date" -> "2021-05-08", "quali_time" -> "13:00:00",
      "position" -> "5",
      "lap" -> "2", "time_laptimes" -> "1:02:03.456789",
      "duration" -> "abc", "fastestLapTime" -> "\\N",
      "fastestLapSpeed" -> "\\N")
    val r4 = row( // third key set: absolute + '+m:ss.sss' race times
      "raceId" -> "102", "date" -> "2021-05-09",
      "circuitId" -> "2", "name_x" -> "Circuit B2", "statusId" -> "2",
      "driverId" -> "3", "dob" -> "2000-01-29", "surname" -> "C",
      "constructorId" -> "11", "resultId" -> "1002",
      "driverStandingsId" -> "502", "constructorStandingsId" -> "602",
      "time" -> "1:31:44.904", "time_races" -> "+1:02.456",
      "position" -> "7", "lap" -> "3")
    val dir = Files.createTempDirectory("f1csv")
    val f = dir.resolve("wide.csv")
    Files.writeString(f, (cols.mkString(",") +: Seq(r1, r2, r3, r4)).mkString("\n"))
    csvPath = f.toString
    F1Pipeline.buildAll(Tables.csv(spark, csvPath, F1Schema.wide), refYear = 2026)
  }

  private var csvPath: String = _

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

  test("Race + referential integrity: every FK resolves (J2 anti-join empty)") {
    import graft.ops.Integrity
    assert(rows("Race").map(_.getInt(0)) == Seq(100, 101, 102))
    val orphans = Integrity.orphans(
      tables("Race").withColumnRenamed("locationId", "locationId"),
      tables("LocationDimension"), Seq("locationId"))
    assert(orphans.count() == 0)
  }

  test("run: the one-call daily job writes all 15 tables, idempotently") {
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
