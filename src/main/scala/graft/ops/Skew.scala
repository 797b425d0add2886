package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4: the engine must survive keys
  * whose row counts dwarf the rest — at 100 TB a single hot key can pin
  * one reducer for hours). AQE's skew-join splitting handles sort-merge
  * joins automatically; these helpers cover the remaining shapes:
  * aggregations (two-phase salted) and broadcast-incompatible joins
  * (salt-replicated). Results are identical to the unsalted forms — salt
  * only changes the shuffle layout.
  */
object Skew {

  /** Two-phase aggregation: partial-aggregate on (keys, random salt) —
    * spreading a hot key over `salts` reducers — then final-aggregate on
    * the keys. `partial` must be decomposable (sum/count/min/max):
    * supply the partial aggregates and the matching final merge. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * salts).cast("int"))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted count: the common case packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      Seq(count(lit(1)).as("__partial_n")),
      Seq(sum(col("__partial_n")).as("n")))

  /** Skew join without broadcast: salt the big side randomly, replicate
    * every small-side row across all `salts` values, join on
    * (key, salt). Each hot-key bucket lands on a different reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", (rand(42) * salts).cast("int"))
    val saltValues = small.sparkSession.range(salts)
      .select(col("id").cast("int").as("__salt"))
    b.join(small.crossJoin(saltValues), Seq(key, "__salt")).drop("__salt")
  }
}
