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
}
