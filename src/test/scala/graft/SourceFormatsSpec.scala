package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format breadth beyond the corpus's parquet and the reference's
  * CSV: JSON-lines and ORC round-trips with explicit schemas (never
  * inferred — SURVEY §1.3), null preservation, and ORC predicate
  * pushdown. */
class SourceFormatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private val rows = Seq((1L, "alpha", 1.5), (2L, null: String, 2.5), (3L, "gamma", -0.5))

  test("JSON-lines round-trip with explicit schema preserves nulls") {
    val dir = Files.createTempDirectory("src_json").toString + "/out"
    rows.toDF("id", "name", "score").write.json(dir)
    val back = spark.read.schema(schema).json(dir).orderBy("id")
    assert(back.schema == schema)
    val r = back.collect()
    assert(r.length == 3 && r(1).isNullAt(1) && r(2).getDouble(2) == -0.5)
  }

  test("ORC round-trip; filter is pushed to the ORC scan") {
    val dir = Files.createTempDirectory("src_orc").toString + "/out"
    rows.toDF("id", "name", "score").write.orc(dir)
    val back = spark.read.schema(schema).orc(dir)
    assert(back.count() == 3)
    val filtered = back.filter(col("id") > 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"no ORC pushdown: $plan")
    assert(filtered.count() == 2)
  }

  test("schema evolution: mergeSchema unifies files with added columns") {
    // At 100 TB a table's files span months of pipeline versions — late
    // files carry new columns. mergeSchema reads the union schema; rows
    // from old files surface NULL for columns they predate.
    val dir = Files.createTempDirectory("src_evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "score"))
    val r = back.orderBy("id").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("score")))
    assert(r(2).getDouble(r(2).fieldIndex("score")) == 9.5)
  }
}
