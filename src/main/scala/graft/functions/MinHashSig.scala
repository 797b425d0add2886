package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]` — SURVEY §2.10's "aggregate"
  * extension slot): the k-element minhash signature in ONE pass over a
  * document's shingle hashes, instead of k separate `min(...)` aggregate
  * expressions. The buffer is a primitive long array — partial signatures
  * merge element-wise, so map-side combine works and the shuffle carries
  * k longs per document regardless of shingle count.
  *
  * Semantics are identical to the expression form used by
  * TextQueries.minhashCandidates (same [[Text.minhashParams]] LCG
  * permutations over the same 32-bit shingle hash); a spec asserts
  * signature equality on corpus data.
  */
class MinHashSig extends Aggregator[Long, Array[Long], Array[Long]] {

  private val params = Text.minhashParams.toArray
  private val mod = Text.minhashMod

  override def zero: Array[Long] = Array.fill(params.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < params.length) {
      val (a, b) = params(i)
      val v = (a * h + b) % mod
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
