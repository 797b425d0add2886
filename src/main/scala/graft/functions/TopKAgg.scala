package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native per-group TOP-K as an AGGREGATE (`graft_topk(x, k)` →
  * `array<double>` sorted descending) — the aggregate form of the
  * rank-window top-k the engine already optimizes (PlanSpec's
  * WindowGroupLimit pin on q49).
  *
  * Why an aggregate and not always a window: the window form shuffles
  * EVERY row to its group's reducer and sorts there (WindowGroupLimit
  * prunes, but the exchange still moves survivors of a per-partition
  * pass); this aggregate carries a bounded k-element min-heap through
  * partial aggregation, so the exchange moves AT MOST k values per
  * (group × map task) no matter how many rows a group has — the
  * correct shape when k ≪ group size at 100 TB, and it composes where
  * windows cannot (inside rollup/cube/pivot aggregations).
  *
  * Buffer is a plain min-heap on a growable array; serialization is a
  * length-prefixed array of doubles. Merge = fold one heap into the
  * other. The RESULT is order-canonical (descending sort at eval), so
  * partial-merge order cannot affect the output. Ties keep duplicate
  * VALUES (both survive if within k), matching the SQL window oracle
  * `row_number ... ORDER BY v DESC` value-wise.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] with BinaryLike[Expression] {

  private lazy val k: Int = right.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"graft_topk k must be a literal int, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == IntegerType && right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_topk requires (double, literal int) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = left.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.values(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Heap): Any =
    new GenericArrayData(buf.sortedDesc())

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKAgg.Heap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { h.offer(bb.getDouble()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {

  /** Bounded min-heap: root (index 0) is the SMALLEST kept value, so a
    * new candidate either beats the root (replace + sift) or is
    * discarded in O(1). At most k doubles of state per partial buffer. */
  final class Heap(val k: Int) {
    val values = new Array[Double](math.max(k, 1))
    var size: Int = 0

    def offer(v: Double): Unit =
      if (size < k) {
        values(size) = v
        size += 1
        var i = size - 1 // sift up
        while (i > 0 && values((i - 1) / 2) > values(i)) {
          val p = (i - 1) / 2
          val t = values(p); values(p) = values(i); values(i) = t
          i = p
        }
      } else if (k > 0 && v > values(0)) {
        values(0) = v
        var i = 0 // sift down
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && values(l) < values(m)) m = l
          if (r < size && values(r) < values(m)) m = r
          if (m == i) done = true
          else {
            val t = values(m); values(m) = values(i); values(i) = t
            i = m
          }
        }
      }

    def sortedDesc(): Array[Double] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out)
      val rev = new Array[Double](size)
      var i = 0
      while (i < size) { rev(i) = out(size - 1 - i); i += 1 }
      rev
    }
  }
}
