package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** CSV source semantics (SURVEY §2.1 S1/S2, §2.2 P8): explicit schema,
  * `\N` null sentinel handled declaratively, and PERMISSIVE-mode corrupt
  * row capture replacing the reference's try/except-continue row drops
  * (`CompleteETL.py:520-539`). */
class CsvSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  test("nullValue \\N turns sentinels into typed NULLs") {
    val dir = Files.createTempDirectory("csv")
    val f = dir.resolve("t.csv")
    Files.writeString(f, "id,v,name\n1,2.5,a\n2,\\N,\\N\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType),
      StructField("name", StringType)))
    val df = Tables.csv(spark, f.toString, schema)
    val r = df.orderBy("id").collect()
    assert(r(1).isNullAt(1) && r(1).isNullAt(2))
    assert(r(0).getDouble(1) == 2.5)
  }

  test("PERMISSIVE mode captures malformed rows instead of failing") {
    val dir = Files.createTempDirectory("csv")
    val f = dir.resolve("t.csv")
    Files.writeString(f, "id,v\n1,2.5\nnot_an_int,xyz\n3,4.0\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = Tables.csv(spark, f.toString, schema).cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
  }
}
