package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale guard for the IVF/SemDeDup centroid family (VectorQueries.ivfK):
  * the O(n²/k) within-cluster pair-space argument only holds if clusters
  * stay near-balanced — one runaway cluster silently degrades SemDeDup
  * to the quadratic all-pairs join it exists to avoid. q32's output IS
  * the cluster histogram, so the bound is checked on the same assignment
  * every family member uses. */
class ClusterBoundSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("IVF clusters stay near-balanced: max bucket ≤ 3× ideal, " +
      "SemDeDup pair space ≤ 3× the balanced n²/k") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val buckets = SparkEntry.queries("q32_ivf_assign")(spark, sf)
      .select("bucket_size").collect().map(_.getLong(0))
    val k = buckets.length
    assert(buckets.sum == n, "assignment lost vectors")
    val ideal = n.toDouble / k
    assert(buckets.max <= 3 * ideal,
      s"hot cluster ${buckets.max} vs ideal $ideal — the n²/k bound is void; " +
        "grow ivfK or re-seed")
    // SemDeDup generates Σ sz·(sz−1)/2 candidate pairs; balanced k
    // clusters give ~n²/(2k). 3× slack tolerates fixture-scale skew.
    val pairs = buckets.map(b => b * (b - 1) / 2.0).sum
    assert(pairs <= 3 * n.toDouble * n / (2 * k),
      s"pair space $pairs exceeds 3× balanced n²/2k")
  }
}
