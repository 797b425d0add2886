package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition: iteratively delete nodes of degree < k (and
  * their edges) until the remaining subgraph has minimum degree ≥ k —
  * the standard dense-neighborhood extractor. On the near-dup graph it
  * separates TEMPLATE FARMS (mutually-similar clusters that survive
  * peeling) from incidental pairwise matches (chains and stars peel
  * away), a sharper signal than connected components, which keep every
  * chain (q76), and cheaper than counting triangles per node (q142).
  *
  * Peeling algorithm, one round per pass:
  *   degrees over surviving edges → keep nodes with d ≥ k →
  *   semi-join edges on BOTH endpoints → repeat until the edge count
  *   stops changing.
  * Per round: one groupBy shuffle + two semi joins on the candidate-
  * scale edge frame (≪ corpus for a near-dup graph). Rounds are
  * data-bounded (each non-final round removes ≥ 1 node; a long path
  * peels from the ends inward) and capped by `maxRounds` as a
  * runaway guard. Only the per-round edge COUNT touches the driver.
  * Iterative-lineage discipline is [[ConnectedComponents]]' — eager
  * localCheckpoint per round, prior round's blocks freed after the
  * next is materialized.
  */
object KCore {

  /** Surviving SYMMETRIC edge set (cols `src`, `dst`, both
    * orientations) of the k-core of the undirected graph `edges`
    * (cols `src`, `dst`; either or both orientations accepted,
    * self-loops dropped). Node degrees within the core are
    * `groupBy(src).count` over the result. Empty when no k-core
    * exists. */
  def core(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    var (cur, curRdds) = ConnectedComponents.truncate(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var prev = cur.count()
    var round = 0
    while (prev > 0 && round < maxRounds) {
      round += 1
      val keep = cur.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("src").as("node"))
      val next = cur
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
      val (nextT, nextRdds) = ConnectedComponents.truncate(next)
      val c = nextT.count()
      ConnectedComponents.free(curRdds)
      cur = nextT; curRdds = nextRdds
      if (c == prev) return cur // fixpoint: minimum degree ≥ k everywhere
      prev = c
    }
    cur
  }
}
