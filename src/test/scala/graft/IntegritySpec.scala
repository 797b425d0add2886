package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Integrity

/** J2/J3 semantics: the disabled reference trigger (`DDL Final.sql:140-161`)
  * as anti/semi joins. */
class IntegritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val parent = Seq((1, "t1"), (2, "t2")).toDF("fk", "name")
  private val child = Seq((1, "ok"), (3, "orphan")).toDF("fk", "payload")

  test("orphans finds FK violations") {
    val r = Integrity.orphans(child, parent.select("fk"), Seq("fk"))
      .select("payload").as[String].collect().toSeq
    assert(r == Seq("orphan"))
  }

  test("validRows keeps only matched rows") {
    val r = Integrity.validRows(child, parent.select("fk"), Seq("fk"))
      .select("payload").as[String].collect().toSeq
    assert(r == Seq("ok"))
  }
}
