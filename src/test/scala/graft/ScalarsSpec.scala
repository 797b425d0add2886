package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Scalars

/** F1–F12 scalar semantics against the malformed-input fixtures of
  * FIXTURES.md §B — every case the reference defends against per-row:
  * `\N` sentinels, '+gap' race times (time_etl.py:11-27), quote-embedded
  * times (sprint_etl.py:16-18), µs lap times truncated to ms
  * (laps_etl.py:42-45), junk → NULL (errors='coerce'). */
class ScalarsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Option[String] = {
    val df = Seq(Option(input)).toDF("v")
    Option(df.select(c.as("r")).collect()(0).getAs[String]("r"))
  }

  test("F5 parseTimeHms: strict parse, canonical format, NULL on junk") {
    assert(one(Scalars.parseTimeHms(col("v")), "1:02:03") == Some("01:02:03"))
    assert(one(Scalars.parseTimeHms(col("v")), "12:59:59") == Some("12:59:59"))
    assert(one(Scalars.parseTimeHms(col("v")), "garbage") == None)
    assert(one(Scalars.parseTimeHms(col("v")), "\\N") == None)
  }

  test("F6 guard: only parse when ':' present") {
    assert(one(Scalars.parseTimeGuarded(col("v")), "17.123") == None)
    assert(one(Scalars.parseTimeGuarded(col("v")), "1:02:03") == Some("01:02:03"))
  }

  test("F8 lap time: m:ss.SSS and microsecond truncation to ms") {
    assert(one(Scalars.parseLapTime(col("v")), "1:02.345") == Some("00:01:02.345"))
    assert(one(Scalars.parseLapTime(col("v")), "1:02:03.456789") == Some("01:02:03.456"))
    assert(one(Scalars.parseLapTime(col("v")), "junk") == None)
  }

  test("F9 resolveRaceTime: '+ss.sss' gap from midnight") {
    assert(one(Scalars.resolveRaceTime(col("v")), "+17.123") == Some("00:00:17.123"))
  }

  test("F9 resolveRaceTime: '+m:ss.sss' gap") {
    assert(one(Scalars.resolveRaceTime(col("v")), "+1:02.456") == Some("00:01:02.456"))
  }

  test("F9 resolveRaceTime: absolute time passes through canonicalized") {
    assert(one(Scalars.resolveRaceTime(col("v")), "1:02:03") == Some("01:02:03.000"))
    assert(one(Scalars.resolveRaceTime(col("v")), "1:02:03.456") == Some("01:02:03.456"))
  }

  test("F9 resolveRaceTime: junk and sentinel → NULL") {
    assert(one(Scalars.resolveRaceTime(col("v")), "\\N") == None)
    assert(one(Scalars.resolveRaceTime(col("v")), "wat") == None)
  }

  test("F4 stripQuotes removes both quote kinds") {
    assert(one(Scalars.stripQuotes(col("v")), "\"1:02.3'\"") == Some("1:02.3"))
  }

  test("F12 intOrZero: sentinel→0, valid passes") {
    val df = Seq("\\N", "7", "junk").toDF("v")
      .select(Scalars.intOrZero(col("v")).as("r"))
    assert(df.as[Int].collect().toSeq == Seq(0, 7, 0))
  }

  test("F2 age: year subtraction, not birthday-adjusted") {
    val df = Seq("1990-12-31").toDF("v")
      .select(Scalars.age(to_date(col("v")), 2026).as("r"))
    assert(df.as[Int].collect().head == 36)
  }
}
