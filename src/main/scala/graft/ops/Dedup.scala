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

  /** Keep-first as a hash AGGREGATE instead of a window: `min(struct(ord
    * ++ payload))` — the lexicographic struct-min is the first row under
    * `order`. Equivalent to [[keepFirst]] when every `order` column is
    * ascending non-null and totally orders each group.
    *
    * Why it exists: the window form shuffles and SORTS every input row;
    * this form partial-aggregates map-side, so the shuffle carries one
    * row per key — the plan that survives a 100× scale-up. (q03 at
    * sf0.1: 7.2s window → hash-agg is sort-free.)
    *
    * DIVERGENCE MODE (deliberate, documented): `payload` participates in
    * the struct comparison as a trailing tiebreak. When `order` does NOT
    * totally order a group, the survivor is the row with the smallest
    * (order ++ payload) tuple — deterministic, but potentially a
    * *different* row than [[keepFirst]] (whose tie survivor is whichever
    * row_number sorted first, i.e. partition-order-dependent and NOT
    * deterministic). If tie-on-order rows must survive by some other
    * policy, supply an `order` that is total (e.g. append a unique key).
    *
    * @param payload non-key, non-order columns to carry through (also the
    *   comparison tiebreak — see divergence note) */
  def keepFirstAgg(df: DataFrame, keys: Seq[String], order: Seq[String],
      payload: Seq[String]): DataFrame = {
    val carried = order ++ payload
    df.select((keys ++ carried).map(col): _*)
      .groupBy(keys.map(col): _*)
      .agg(min(struct(carried.map(col): _*)).as("__f"))
      .select(keys.map(col) ++ carried.map(c => col(s"__f.$c").as(c)): _*)
  }

  /** D1: full-row distinct (`airflow/dags/CompleteETL.py:22, 37`;
    * `date_etl.py:15`). Spark: hash-aggregate on all columns. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()
}
