package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, composed from
  * higher-order functions (`zip_with` + `aggregate`) so it runs inside
  * codegen and needs no UDF.
  *
  * Accumulation is a left fold in index order over doubles — bit-identical
  * to the DuckDB oracle's `list_sum(list_transform(...))`, which is why
  * hash-compared similarity results can match exactly. Floats are widened
  * to double *before* multiplication (exact) in both engines.
  *
  * Scale notes (100 TB): brute-force cosine top-k broadcasts the (small)
  * query set and is embarrassingly parallel over candidates; the
  * O(n·q·d) work is the ceiling. The LSH/IVF path in VectorQueries bounds
  * the candidate set per query instead.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
