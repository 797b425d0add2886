package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Sinks

/** SURVEY §2.1 S3/S4 executed for real: the reference's actual sink is a
  * row-wise JDBC load (`airflow/dags/driver_etl.py:87-96` — one INSERT +
  * autocommit per row into MS SQL Server). `Sinks.jdbc` is the
  * set-oriented restatement (batched, parameter-bound, READ_COMMITTED);
  * until this spec it had only ever been exercised for config shape.
  * Derby ships on Spark's classpath, so an embedded database gives the
  * full write→read round-trip without network or a server. */
class JdbcSinkSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val url = {
    val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dbDir;create=true"
  }

  private def readBack(table: String) =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", "app").option("password", "app")
      .load()

  test("Sinks.jdbc: F1 Driver rows round-trip through embedded Derby") {
    val driver = F1Fixture.tables("Driver")
    Sinks.jdbc(driver, url, "DRIVER", "app", "app")
    val back = readBack("DRIVER")
    assert(back.columns.sorted.map(_.toLowerCase)
      sameElements driver.columns.sorted.map(_.toLowerCase))
    val key = driver.columns.head
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(driver.columns.map(org.apache.spark.sql.functions.col): _*)
        .orderBy(key).collect().toSeq.map(_.toSeq)
    assert(canon(back) == canon(driver),
      "rows read back from Derby differ from the pipeline's Driver table")
  }

  test("Sinks.jdbc: append is append — a second load adds rows") {
    val driver = F1Fixture.tables("Driver")
    val before = readBack("DRIVER").count()
    Sinks.jdbc(driver, url, "DRIVER", "app", "app")
    assert(readBack("DRIVER").count() == before + driver.count())
  }

  test("jdbcFull: createTableColumnTypes drives the dialect DDL — " +
      "declared VARCHAR width is enforced by the database") {
    import spark.implicits._
    val rows = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    // width 8 admits the fixture values...
    Sinks.jdbcFull(rows, url, "TYPED", "app", "app",
      mode = org.apache.spark.sql.SaveMode.Overwrite,
      columnTypes = Some("name VARCHAR(8)"))
    assert(readBack("TYPED").count() == 2)
    // ...and rejects an overflow — proof the mapping reached the DDL
    // (the dialect default for StringType is CLOB, which would accept it)
    val tooWide = Seq((3L, "x" * 64)).toDF("id", "name")
    intercept[Exception] {
      Sinks.jdbcFull(tooWide, url, "TYPED", "app", "app")
    }
    assert(readBack("TYPED").count() == 2, "failed batch must not commit")
  }

  test("jdbcFull: truncate-overwrite reloads in place; numPartitions " +
      "bounds connection parallelism; isolation NONE accepted") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    Sinks.jdbcFull(v1.repartition(6), url, "TRUNC", "app", "app",
      mode = org.apache.spark.sql.SaveMode.Overwrite,
      numPartitions = Some(2)) // 6 input partitions coalesce to 2 connections
    assert(readBack("TRUNC").count() == 3)
    val v2 = Seq((9L, "z")).toDF("id", "name")
    Sinks.jdbcFull(v2, url, "TRUNC", "app", "app",
      mode = org.apache.spark.sql.SaveMode.Overwrite,
      truncate = true, isolationLevel = "NONE")
    val back = readBack("TRUNC").collect()
    assert(back.length == 1 && back(0).getLong(0) == 9L,
      "truncate-overwrite must replace contents, keep the table")
  }
}
