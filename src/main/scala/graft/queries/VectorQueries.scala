package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Vectors

/** Similarity search over `embeddings.embedding` (array<float>, 64-dim) —
  * driver-mandated ANN surface. Brute-force cosine top-k is the
  * correctness baseline; the IVF-style bucketed variant bounds candidates
  * per query for the 100 TB path.
  *
  * Oracle parity: both engines widen float→double then fold the products
  * in index order (see [[graft.functions.Vectors]]), so similarities are
  * bit-identical before the final 6-decimal round.
  */
object VectorQueries {

  private val dim = 64
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  val specs: Seq[QuerySpec] = Seq(

    // q31 — brute-force cosine top-5 for 8 query vectors. The query set is
    // broadcast (tiny); candidates stream through map-side only — no
    // shuffle until the per-query top-k, which is a windowed rank over
    // q_id. At 100 TB the same plan holds: broadcast queries, narrow scan,
    // rank shuffle of |q|·k rows.
    QuerySpec("q31_cosine_topk",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val scored = emb.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(Vectors.cosine(col("q_vec"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))
        scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select("q_id", "vec_id", "cos_sim", "rnk")
          .orderBy("q_id", "rnk")
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 8),
              |scored AS (
              |  SELECT q.q_id, e.vec_id,
              |    round(${duckCos("q.q_vec", "e.embedding")}, 6) AS cos_sim
              |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
              |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk FROM scored)
              |SELECT q_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
              |ORDER BY q_id, rnk""".stripMargin)),

    // q32 — IVF-style bucketed ANN: every vector is assigned to its
    // nearest of 4 fixed centroids (vec_id 0..3, broadcast — the "coarse
    // quantizer"); per-bucket stats verify the assignment. At scale the
    // bucket id becomes the shuffle/partition key and similarity search
    // probes only matching buckets instead of all n candidates.
    QuerySpec("q32_ivf_assign",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
        val assigned = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("label"), col("cent_id"),
            round(Vectors.cosine(col("cent_vec"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy("vec_id")
          .orderBy(col("cos_sim").desc, col("cent_id"))
        assigned.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy("cent_id")
          .agg(count(lit(1)).as("bucket_size"),
            min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
          .orderBy("cent_id")
      },
      Some(s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings WHERE vec_id < 4),
              |assigned AS (
              |  SELECT e.vec_id, c.cent_id,
              |    round(${duckCos("c.cent_vec", "e.embedding")}, 6) AS cos_sim
              |  FROM embeddings e, cents c),
              |best AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, cent_id) AS rn FROM assigned)
              |SELECT cent_id, count(*) AS bucket_size, min(vec_id) AS min_vec, max(vec_id) AS max_vec
              |FROM best WHERE rn = 1 GROUP BY cent_id ORDER BY cent_id""".stripMargin)))
}
