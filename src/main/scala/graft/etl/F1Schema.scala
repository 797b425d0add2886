package graft.etl

import org.apache.spark.sql.types._

/** Explicit schema for the reference's wide denormalized CSV (the Ergast
  * "dataEngineeringDataset" — every DAG reads it, e.g.
  * `airflow/dags/CompleteETL.py:18-20`). The reference infers dtypes per
  * task (pandas `read_csv`, no dtypes — SURVEY §1.3); here the schema is
  * fixed: numeric keys typed, every date/time column read as string and
  * parsed explicitly by the transforms (so malformed values coerce to NULL
  * exactly once, not ad hoc per row). `\N` sentinels become NULL at the
  * source via the reader's nullValue option (Tables.csv).
  */
object F1Schema {

  private def i(n: String)  = StructField(n, IntegerType)
  private def d(n: String)  = StructField(n, DoubleType)
  private def s(n: String)  = StructField(n, StringType)

  /** Union of all columns the 16 DAG extracts consume (FIXTURES.md §B). */
  val wide: StructType = StructType(Seq(
    // date dimension source
    s("date"),
    // location
    i("circuitId"), s("circuitRef"), s("name_x"), s("location"),
    s("country"), d("lat"), d("lng"), s("url_x"),
    // status
    i("statusId"), s("status"),
    // driver
    i("driverId"), s("forename"), s("surname"), s("dob"), s("nationality"),
    s("url"), i("number"), s("constructorRef"), s("driverRef"), s("code"),
    // team
    i("constructorId"), s("name"), s("nationality_constructors"),
    s("url_constructors"),
    // race
    i("raceId"), i("round"),
    // free practice
    s("fp1_date"), s("fp1_time"), s("fp2_date"), s("fp2_time"),
    s("fp3_date"), s("fp3_time"),
    // pit stops
    i("stop"), i("lap_pitstops"), s("time_pitstops"), s("duration"),
    i("milliseconds_pitstops"),
    // qualification
    s("quali_date"), s("quali_time"), s("position"),
    // driver standings
    i("driverStandingsId"), d("points_driverstandings"),
    i("position_driverstandings"), i("wins"),
    // sprint
    s("sprint_date"), s("sprint_time"),
    // team standings
    i("constructorStandingsId"), d("points_constructorstandings"),
    i("position_constructorstandings"), i("wins_constructorstandings"),
    // time dimension
    s("time"), s("time_races"),
    // results
    i("resultId"), i("positionOrder"), d("points"), i("laps"),
    i("grid"), i("rank"), i("fastestLap"), s("fastestLapTime"),
    s("fastestLapSpeed"),
    // laps
    i("lap"), s("time_laptimes"), i("position_laptimes"),
    i("milliseconds_laptimes")))
}
