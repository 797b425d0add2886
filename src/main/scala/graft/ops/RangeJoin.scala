package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval matching WITHOUT an equi key.
  *
  * Spark plans a bare `p >= lo AND p < hi` join as
  * BroadcastNestedLoopJoin: every (point, interval) pair is compared, and
  * when neither side fits in memory there is no good physical choice at
  * all. Binning restores an equi key: quantize points to
  * `floor(p / binWidth)`, replicate each interval over the bins it
  * covers, equi-join on the bin, then apply the exact containment
  * predicate. Each matching pair meets exactly once — a point lives in
  * exactly one bin, and the interval's replica set contains that bin —
  * so no post-join dedup is needed.
  *
  * Scale shape: shuffle (or broadcast, Catalyst's choice) on `__bin`
  * instead of a full cross product; interval replication is
  * `width / binWidth + 1` rows per interval, the knob that trades
  * shuffle volume against per-bin fan-in. Works for negative values
  * (floor division is order-preserving everywhere).
  */
object RangeJoin {

  /** Join `points` to the intervals whose `[lo, hi)` half-open range
    * contains `points(pCol)`. The interval side must carry `loCol`
    * and `hiCol`; all three are numeric.
    */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val pb = points.withColumn("__bin", bin(col(pCol)))
    val ib = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }

  /** INTERVAL-overlap join: pairs where `[lLo, lHi]` and `[rLo, rHi]`
    * intersect (closed ends). Both sides replicate over their covered
    * bins and equi-join on the bin; the exact overlap predicate then
    * filters, and the FIRST-OVERLAPPING-BIN rule — the pair is kept
    * only in the bin of `max(lLo, rLo)`, which both replica sets
    * necessarily contain — makes each pair match exactly once with NO
    * distinct/dedup pass (a distinct would be a second shuffle of the
    * matched set). Replication is `width/binWidth + 1` per interval:
    * size binWidth near the typical interval length. All columns
    * integral (bin arithmetic stays exact).
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val lb = left.withColumn("__bin",
      explode(sequence(bin(col(lLo)), bin(col(lHi)))))
    val rb = right.withColumn("__bin",
      explode(sequence(bin(col(rLo)), bin(col(rHi)))))
    lb.join(rb, Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === bin(greatest(col(lLo), col(rLo))))
      .drop("__bin")
  }
}
