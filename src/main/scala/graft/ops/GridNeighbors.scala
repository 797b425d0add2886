package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Cleanup.PersistTrackedOps

/** ε-neighbor pairs on a 2-D plane via the GRID TRICK, with DENSE CELLS
  * salted (VERDICT r11 #6).
  *
  * Cell width = eps, so every ε-pair is a king-move cell pair: each
  * point fans to the 3×3 cell coverage of the other side and the pair
  * space collapses to ONE equi-join on cell id — candidate volume
  * Σ 9·|cell|·density, corpus-linear at fixed density, never the
  * all-pairs product. The residual scale hazard is DENSITY SKEW: one
  * pathologically dense cell makes that cell's candidate set quadratic
  * (|cell|² pairs on a single shuffle key — at 100 TB with clustered
  * embeddings that is a hot-key stall). Cells at or above
  * `denseThreshold` points are therefore routed through the salted
  * SHUFFLE_HASH join ([[Skew.saltedJoin]] — the same machinery the LSH
  * band joins use, q50/q71): the quadratic pair count still exists (it
  * is the answer), but evaluates across `salts` reducers instead of
  * pinning one. Sparse cells keep the plain equi-join. The two paths
  * partition the key space exactly — each cell id flows through exactly
  * one — so the union is value-identical to the unsalted form.
  */
object GridNeighbors {

  /** All ordered pairs `(ai, bi)`, `ai != bi`, with squared Euclidean
    * distance strictly below `eps²`. `pts` must carry `(id, x, y)`. */
  def epsPairs(pts: DataFrame, eps: Double,
      denseThreshold: Int = 256, salts: Int = 8): DataFrame = {
    val own = pts
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
    val cov = pts
      .select(col("id").as("bi"), col("x").as("bx"), col("y").as("by"),
        explode(expr("sequence(-1L, 1L)")).as("dx"),
        floor(col("x") / eps).cast("long").as("ocx"),
        floor(col("y") / eps).cast("long").as("ocy"))
      .select(col("bi"), col("bx"), col("by"),
        (col("ocx") + col("dx")).as("cx"),
        explode(expr("sequence(-1L, 1L)")).as("dy"), col("ocy"))
      .select(col("bi"), col("bx"), col("by"), col("cx"),
        (col("ocy") + col("dy")).as("cy"))
    // the dense-cell list is tiny by construction (hot spots only) —
    // persist the one aggregation and broadcast it into the four
    // membership probes
    val dense = own.groupBy("cx", "cy").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= denseThreshold)
      .select("cx", "cy").persistTracked()
    val sparsePairs = own
      .join(broadcast(dense), Seq("cx", "cy"), "left_anti")
      .join(cov.join(broadcast(dense), Seq("cx", "cy"), "left_anti"),
        Seq("cx", "cy"))
    // the 9×-fanned coverage side is the bigger stream — salt it; the
    // dense cells' own points replicate across the salt space
    val densePairs = Skew.saltedJoin(
      cov.join(broadcast(dense), Seq("cx", "cy"), "left_semi"),
      own.join(broadcast(dense), Seq("cx", "cy"), "left_semi"),
      Seq("cx", "cy"), salts)
    sparsePairs.unionByName(densePairs.select(sparsePairs.columns
      .map(col).toIndexedSeq: _*))
      .filter(col("id") =!= col("bi") &&
        (col("x") - col("bx")) * (col("x") - col("bx")) +
          (col("y") - col("by")) * (col("y") - col("by")) < eps * eps)
      .select(col("id").as("ai"), col("bi"))
  }
}
