package graft

import org.scalatest.funsuite.AnyFunSuite

/** Output-boundary type rule (round 9, VERDICT r8): NO query may expose a
  * DecimalType column. The driver's hasher canonicalizes Spark parquet
  * DECIMALs and DuckDB oracle values differently whenever a value's
  * fixed-scale string differs from its float repr ('87.50' vs '87.5') —
  * 21 value-exact queries failed the r8 hash gate exactly that way.
  * Decimal-stable INTERNAL arithmetic stays (it is the order-free
  * summation discipline); the final projection casts to DOUBLE/BIGINT.
  * This spec makes the r1–r7 implicit convention an enforced invariant:
  * it builds every declared query against the sf0.001 corpus and walks
  * the result schema (nested types included). */
class OutputSchemaSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  // the walk is SHARED with the SchemaProbe dev tool — gate and probe
  // must agree on what counts as an offender
  private def decimalPaths(dt: org.apache.spark.sql.types.DataType,
      path: String): Seq[String] = SchemaProbe.decimalPaths(dt, path)

  test("no query output schema contains a DecimalType column") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val spark = TestSpark.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // Construction is analysis-only for batch queries; streaming /
        // storage queries materialize — that cost IS the check (their
        // output schema is only knowable post-run).
        val schema = fn(spark, sfDir).schema
        schema.fields.toSeq.flatMap(f =>
          decimalPaths(f.dataType, f.name).map(p => s"$name:$p"))
    }
    assert(offenders.isEmpty,
      s"DecimalType reached the output boundary (cast to double at the " +
        s"final projection, keep decimal math internal): $offenders")
  }
}
