package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-first deduplication — the reference's signature operator (SURVEY
  * §2.3): pandas `drop_duplicates` and hand-rolled `set()` loops, e.g.
  * `airflow/dags/laps_etl.py:34-56`, `airflow/dags/pitstop.py:26-55`,
  * `airflow/dags/quali_etl.py:26-34`.
  *
  * pandas keeps the first row in current order; Spark's `dropDuplicates`
  * keeps an *arbitrary* row. The faithful mapping is `row_number` over an
  * explicit total order. Scale: one hash-partition shuffle on the keys and
  * a per-partition sort, fully distributed and spillable — versus the
  * reference's O(rows) Python set held in a single worker process.
  */
object Dedup {

  /** D2/D3: keep the first row per key group under `order` (must be a total
    * order within each group for determinism). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D1: full-row distinct (`airflow/dags/CompleteETL.py:22, 37`;
    * `date_etl.py:15`). Spark: hash-aggregate on all columns. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()
}
