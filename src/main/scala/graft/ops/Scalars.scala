package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions F1–F12 from SURVEY §2.8, re-expressed as codegen'd
  * Catalyst expressions. The reference implements each as a per-row Python
  * helper (e.g. `airflow/dags/CompleteETL.py:317-334`); here each is a
  * `Column` composition that stays inside whole-stage codegen — no UDFs in
  * the hot path.
  *
  * Requires `spark.sql.ansi.enabled=false` (pandas `errors='coerce'`
  * fidelity: junk casts produce NULL, not exceptions — SURVEY §7.4 risk 3).
  */
object Scalars {

  /** F1 calendar split (`airflow/dags/date_etl.py:28-30`). */
  def calendar(d: Column): Seq[Column] =
    Seq(dayofmonth(d).as("day"), month(d).as("month"), year(d).as("year"))

  /** F2 age derivation — deliberately NOT birthday-adjusted, faithful to
    * `airflow/dags/driver_etl.py:49` (`current_year - year(dob)`).
    * `refYear` is explicit so tests and oracles stay deterministic. */
  def age(dob: Column, refYear: Int): Column =
    (lit(refYear) - year(dob)).cast("int")

  /** F4 quote stripping (`airflow/dags/sprint_etl.py:16-18`). */
  def stripQuotes(c: Column): Column = translate(c, "\"'", "")

  /** F5 strict time parse + canonical re-format; NULL on junk — pandas
    * `errors='coerce'` (`airflow/dags/CompleteETL.py:317-324`). */
  def parseTimeHms(c: Column): Column =
    date_format(to_timestamp(c, "H:mm:ss"), "HH:mm:ss")

  /** F6 contains-check guard before parsing (`airflow/dags/pitstop.py:35`,
    * `CompleteETL.py:416`). */
  def parseTimeGuarded(c: Column): Column =
    when(c.contains(":"), parseTimeHms(c)).otherwise(lit(null).cast("string"))

  /** F7 permissive date parse (`airflow/dags/race_etl.py:36-37`). */
  def parseDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** F8 millisecond lap-time: 'm:ss.SSS' free-form → 'HH:mm:ss.SSS', µs
    * truncated to ms (`airflow/dags/laps_etl.py:42-45`). */
  def parseLapTime(c: Column): Column =
    date_format(
      coalesce(
        to_timestamp(c, "m:ss.SSS"),
        to_timestamp(c, "H:mm:ss.SSS"),
        to_timestamp(c, "H:mm:ss.SSSSSS")), // µs input; format truncates → ms
      "HH:mm:ss.SSS")

  /** F9 relative race-time resolution (`airflow/dags/time_etl.py:11-27`):
    * `'+ss.sss'` / `'+m:ss.sss'` gap strings are offsets from midnight;
    * absolute `'H:mm:ss[.SSS]'` re-canonicalizes; junk → NULL. The one
    * reference scalar with no single Spark built-in — composed from millis
    * arithmetic rather than a UDF so it stays codegen-compatible. */
  def resolveRaceTime(c: Column): Column = {
    val gap   = c.substr(lit(2), length(c)) // text after '+'
    val parts = split(gap, ":")
    val gapMs = when(size(parts) === 2,
        parts.getItem(0).cast("long") * 60000L +
          round(parts.getItem(1).cast("double") * 1000).cast("long"))
      .otherwise(round(gap.cast("double") * 1000).cast("long"))
    val absTs = coalesce(to_timestamp(c, "H:mm:ss.SSS"), to_timestamp(c, "H:mm:ss"))
    when(c.startsWith("+"),
        date_format(timestamp_millis(gapMs), "HH:mm:ss.SSS"))
      .otherwise(date_format(absTs, "HH:mm:ss.SSS"))
  }

  /** F11 string→double, NULL on junk (`airflow/dags/results_etl.py:46`). */
  def toDoubleOrNull(c: Column): Column = c.cast("double")

  /** F12 sentinel→0 default (`airflow/dags/quali_etl.py:57`: `\N`→0). */
  def intOrZero(c: Column): Column = coalesce(c.cast("int"), lit(0))
}
