package graft

import java.nio.file.Files
import graft.core.Tables
import graft.etl.{F1Pipeline, F1Schema}

/** Shared wide-CSV fixture (FIXTURES.md §B malformed-input cases): `\N`
  * sentinels, malformed dates/times, duplicate keys, quote-embedded
  * values → the 16 star tables. Built once per JVM; used by
  * F1PipelineSpec (golden transforms), IncrementalSpec and JdbcSinkSpec
  * (sink surfaces over real pipeline output). */
object F1Fixture {

  val cols: Array[String] = F1Schema.wide.fields.map(_.name)

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

  def row(over: (String, String)*): String = {
    val m = defaults ++ over
    cols.map(m(_)).mkString(",")
  }

  /** The four fixture rows: r1 valid, r2 duplicate-keys-of-r1 (must lose
    * keep-first), r3 `\N`/junk-heavy, r4 alternate race-time formats. */
  lazy val fixtureRows: Seq[String] = {
    val r1 = row()
    val r2 = row(
      "name_x" -> "Circuit A2", "status" -> "Retired2", "surname" -> "V2",
      "name" -> "RB2", "position_laptimes" -> "9")
    val r3 = row(
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
    val r4 = row(
      "raceId" -> "102", "date" -> "2021-05-09",
      "circuitId" -> "2", "name_x" -> "Circuit B2", "statusId" -> "2",
      "driverId" -> "3", "dob" -> "2000-01-29", "surname" -> "C",
      "constructorId" -> "11", "resultId" -> "1002",
      "driverStandingsId" -> "502", "constructorStandingsId" -> "602",
      "time" -> "1:31:44.904", "time_races" -> "+1:02.456",
      "position" -> "7", "lap" -> "3")
    Seq(r1, r2, r3, r4)
  }

  /** Write a wide CSV with header + `rows` to a fresh temp file. */
  def writeCsv(rows: Seq[String]): String = {
    val f = Files.createTempDirectory("f1csv").resolve("wide.csv")
    Files.writeString(f, (cols.mkString(",") +: rows).mkString("\n"))
    f.toString
  }

  lazy val csvPath: String = writeCsv(fixtureRows)

  lazy val tables: Map[String, org.apache.spark.sql.DataFrame] =
    F1Pipeline.buildAll(
      Tables.csv(TestSpark.spark, csvPath, F1Schema.wide), refYear = 2026)
}
