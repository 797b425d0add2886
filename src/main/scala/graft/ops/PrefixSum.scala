package graft.ops

import graft.core.Cleanup.PersistTrackedOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — cumulative sum in the total order of a unique
  * key, without the single-task global window (`Window.orderBy(key)` with
  * no partition key moves ALL rows to one reducer; at 100 TB that is the
  * operator that never finishes).
  *
  * Classic two-phase shape instead:
  *  1. range-partition on the key (so partition p holds a contiguous key
  *     range, every key in p greater than every key in p-1),
  *  2. per-partition window cumsum (parallel across partitions),
  *  3. per-partition totals → exclusive running offsets — an
  *     O(numPartitions)-row problem, safe to window on one reducer —
  *     broadcast back and added.
  *
  * The result is a pure function of (key order, values): partition
  * boundaries (sampled by the range partitioner) affect only the layout,
  * never the returned sums.
  */
object PrefixSum {

  /** Adds column `out` = sum of `valueCol` over all rows with key ≤ this
    * row's key. `keyCol` must be unique (it defines the total order);
    * `valueCol` must be integral (sums stay exact).
    */
  def cumsum(df: DataFrame, keyCol: String, valueCol: String, out: String,
      numParts: Int = 32): DataFrame =
    cumsum(df, Seq(keyCol), valueCol, out, numParts)

  /** Multi-column total order: the TUPLE `keyCols` must be unique. This
    * is the scale-safe form when no single column is both unique and
    * orderable — e.g. (hash, id) tiebreaks — packing such a tuple into
    * one numeric key (hash*K + id) silently caps id < K and breaks
    * injectivity beyond it (ADVICE r04 on q114). Range partitioning and
    * the per-partition window both order lexicographically on the tuple,
    * so no packing is needed at any id range.
    */
  def cumsum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      out: String, numParts: Int): DataFrame = {
    // Internal names carry the (caller-unique) `out` suffix so CHAINED
    // cumsum calls on one frame can't collide (a leaked `__off` made the
    // second call's join ambiguous — hit by q312's triple rank).
    val pidC = s"__pid_$out"; val locC = s"__local_$out"
    val totC = s"__tot_$out"; val offC = s"__off_$out"
    // One evaluation of spark_partition_id, pinned by the persist below:
    // the ranged exchange samples boundaries per execution, so the pid
    // column must never be recomputed across the two uses of `local`.
    // The INPUT persists too (optimization r13): repartitionByRange runs
    // a separate range-SAMPLING job per execution, so an unpersisted
    // input pipeline ran once for the sampler and again for the real
    // exchange — on q43/q312-class callers that doubled the corpus-scale
    // pass feeding every cumsum.
    val base = df.persistTracked()
    val ranged = base.repartitionByRange(numParts, keyCols.map(col): _*)
      .withColumn(pidC, spark_partition_id())
    val wLocal = Window.partitionBy(pidC).orderBy(keyCols.map(col): _*)
    val local = ranged
      .withColumn(locC, sum(col(valueCol)).over(wLocal))
      .persistTracked()
    import org.apache.spark.sql.types._
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral) {
      // Exclusive prefix of the per-partition totals, computed on the
      // DRIVER (optimization r14): the totals are O(numParts) rows —
      // metadata-grain at any corpus size (the Quantiles 1-row head()
      // precedent) — so collecting them and re-emitting the running
      // offsets as an O(1)-indexed ARRAY LITERAL removes, from EVERY
      // cumsum, the single-partition window exchange, the broadcast
      // exchange, and the pid join (3 exchange-ish plan nodes + their
      // driver-scheduled jobs; q312 chains three cumsums and spent its
      // time in exactly this per-cumsum job train). Values are
      // bit-identical: same per-partition totals, same exclusive
      // running sum, integer arithmetic throughout.
      val tot = local.groupBy(pidC).agg(sum(col(valueCol)).as(totC))
        .collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
        .sortBy(_._1)
      val maxPid = if (tot.isEmpty) 0 else tot.map(_._1).max
      val offs = new Array[Long](maxPid + 1)
      var run = 0L
      tot.foreach { case (p, t) => offs(p) = run; run += t }
      // element_at is 1-based; pids are dense [0, actualParts) (AQE
      // coalescing merges ADJACENT range partitions, preserving both
      // density and key order). Absent pids hold no rows; their array
      // slot is never read.
      local
        .withColumn(out,
          col(locC) + element_at(typedlit(offs.toSeq), col(pidC) + 1))
        .drop(pidC, locC)
    } else {
      // Non-integral values (decimal callers): the original broadcast
      // merge — exclusive prefix of the per-partition totals via the
      // deliberate unpartitioned window (numParts rows, not data rows).
      val wOff = Window.orderBy(pidC)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy(pidC)
        .agg(sum(col(valueCol)).as(totC))
        .withColumn(offC, coalesce(sum(col(totC)).over(wOff), lit(0L)))
        .select(pidC, offC)
      local.join(broadcast(offsets), pidC)
        .withColumn(out, col(locC) + col(offC))
        .drop(pidC, locC, offC)
    }
  }
}
