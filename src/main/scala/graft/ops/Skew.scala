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
    * (keys, salt). Each hot-key bucket lands on `salts` different
    * reducers instead of one. Trade: the replicated side's shuffle volume
    * grows `salts`× — bounded and distributed, unlike a broadcast of a
    * corpus-proportional table (which OOMs the driver/executors at scale).
    * Every matching pair still meets exactly once (the salted row's one
    * random salt meets the one matching replica).
    *
    * The SHUFFLE_HASH hint is load-bearing, twice over. (1) Without it the
    * planner broadcasts whichever side its size estimate likes — at real
    * scale that is a corpus-proportional broadcast (the OOM this operator
    * exists to avoid), and even at bench scale a broadcast join inherits
    * the probe side's partitioning, which for a single parquet file is ONE
    * partition: every pair evaluation serializes into a single task and
    * the salt spreads nothing (q71 at sf0.1: 12s single-task → sub-second
    * across 32 reducers). Salting only works if the join actually
    * shuffles on (keys, salt). (2) SHUFFLE_HASH (vs letting it fall to
    * sort-merge) skips sorting both sides; the per-reducer build side is
    * one hot-key bucket's replicas — bounded by design, so the hash
    * relation fits. The salted side is the build: its per-reducer bucket
    * holds ~1/salts of a hot key vs the replicated side's full copy. */
  def saltedJoin(big: DataFrame, replicated: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val b = big.withColumn("__salt", (rand(42) * salts).cast("int"))
    val saltValues = replicated.sparkSession.range(salts)
      .select(col("id").cast("int").as("__salt"))
    b.hint("shuffle_hash")
      .join(replicated.crossJoin(saltValues), keys :+ "__salt").drop("__salt")
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = saltedJoin(big, small, Seq(key), salts)
}
