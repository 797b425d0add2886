package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Multi-source breadth-first search over an edge list — exact minimum
  * hop count from a seed set, the primitive behind "how far is this
  * document from a known-bad cluster" style provenance/contamination
  * queries (the reference has no graph ops at all; this extends the
  * near-dup graph machinery the dedup family already builds).
  *
  * Frontier algorithm, one round per hop level:
  *   frontier(r) ⨝ edges → neighbors, LEFT ANTI visited → frontier(r+1).
  * Per round that is one keyed shuffle on candidate-scale frames (the
  * near-dup graph is ≪ corpus) plus an anti-join against the visited
  * set; rounds are bounded by `maxDepth`, so the plan cannot run away on
  * cyclic graphs. At 100 TB the same loop runs with cluster-sized
  * shuffle parallelism — nothing here is driver-resident except the
  * per-round row count used for convergence.
  *
  * Iterative-lineage discipline is identical to [[ConnectedComponents]]
  * (and load-bearing for the same reason): every round ends in an eager
  * localCheckpoint via [[ConnectedComponents.truncate]], and the prior
  * round's blocks are freed deterministically once the next round is
  * materialized.
  */
object Bfs {

  /** Minimum hops from any node of `seeds` (col `node`) over undirected
    * `edges` (cols `src`, `dst`), capped at `maxDepth`. Output:
    * (node, hops) with hops ∈ [0, maxDepth]; nodes unreachable within
    * the cap are absent. Seeds not present in `edges` still appear at
    * hops = 0 (they are their own BFS tree roots). */
  def hops(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val fwd = edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst"))
    val sym = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)

    // visited carries the FINAL answer (first-touch hop level is the
    // minimum by BFS invariant); frontier is the current wave only.
    var (visited, visitedRdds) = ConnectedComponents.truncate(
      seeds.select(col("node")).distinct().withColumn("hops", lit(0)))
    var (frontier, frontierRdds) = ConnectedComponents.truncate(
      visited.select("node"))
    var depth = 0
    var waveSize = frontier.count()
    while (waveSize > 0 && depth < maxDepth) {
      depth += 1
      val next = frontier.join(sym, frontier("node") === sym("src"))
        .select(sym("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
      val (nextT, nextRdds) = ConnectedComponents.truncate(next)
      val (newVisited, newVisitedRdds) = ConnectedComponents.truncate(
        visited.union(nextT.withColumn("hops", lit(depth))))
      waveSize = nextT.count()
      ConnectedComponents.free(visitedRdds ++ frontierRdds)
      visited = newVisited; visitedRdds = newVisitedRdds
      frontier = nextT; frontierRdds = nextRdds
    }
    sym.unpersist(blocking = false)
    visited
  }

  /** Cheapest-path cost from the seed set within `maxHops` edges —
    * bounded BELLMAN-FORD over undirected weighted `edges`
    * (cols `src`, `dst`, `w`: positive integer weights). Exactly
    * `maxHops` relaxation rounds (the bounded-radius semantics [[hops]]
    * has for hop counts, here for summed weights): each round is one
    * keyed shuffle join + a min-aggregate over (previous dists ∪
    * relaxed candidates), with the [[ConnectedComponents]] checkpoint
    * discipline per round. Output (node, cost) = minimum total weight
    * over paths of ≤ maxHops edges; nodes unreachable within the cap
    * are absent. Deterministic: fixed round count, integer min —
    * partial-merge order cannot matter. */
  def cheapestWithin(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"), col("w"))
      .filter(col("src") =!= col("dst"))
    val sym = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var (dist, distRdds) = ConnectedComponents.truncate(
      seeds.select(col("node")).distinct().withColumn("cost", lit(0L)))
    var round = 0
    while (round < maxHops) {
      round += 1
      val relaxed = dist.join(sym, dist("node") === sym("src"))
        .select(sym("dst").as("node"), (dist("cost") + sym("w")).as("cost"))
        .union(dist.select(col("node"), col("cost")))
        .groupBy("node").agg(min(col("cost")).as("cost"))
      val (nextT, nextRdds) = ConnectedComponents.truncate(relaxed)
      nextT.count() // materialize before freeing the previous round
      ConnectedComponents.free(distRdds)
      dist = nextT; distRdds = nextRdds
    }
    sym.unpersist(blocking = false)
    dist
  }
}
