package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 2-D Morton (z-order) interleave — the space-filling curve
  * behind OPTIMIZE ZORDER in every lakehouse engine: sorting rows by
  * the interleaved bits of two columns co-locates 2-D-near rows in the
  * same files, which is what makes min/max zone maps (q274) effective
  * on BOTH dimensions at once instead of only the leading sort key.
  *
  * `graft_zorder2(x, y)` takes the LOW 16 BITS of each bigint input
  * (callers bound their coordinates into [0, 65536) — the query-side
  * contract, matching the fixture geometry) and produces the 32-bit
  * interleave with x in the even bit positions and y in the odd ones.
  * The spread uses the classic mask-shift ladder (4 shift-mask steps
  * per dimension, branch-free), a static helper shared by interpreted
  * eval and generated code (the Levenshtein pattern) so per-row work
  * stays inside whole-stage codegen.
  *
  * The oracle side cannot call this expression, so query SQL GENERATES
  * the equivalent 32-term shift/mask expression from [[ZOrder.bits]]
  * (NOTES rule 7: one source of truth for both engines).
  */
case class ZOrder2D(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_zorder2 requires two bigint arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  /** Bits per dimension: 16 each → a 32-bit curve position. */
  val bits: Int = 16

  /** Spread the low 16 bits of `v` to the even positions of a 32-bit
    * word: ...b2 b1 b0 → ...0 b2 0 b1 0 b0. */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Static entry point shared by interpreted eval and generated code:
    * x in even bit positions, y in odd. */
  def interleave2(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** The same interleave as portable SQL over `x`/`y` column names —
    * 2·16 shift-mask-shift terms OR-composed. Used to GENERATE oracle
    * SQL so both engines compute one definition. */
  def sql(x: String, y: String): String = {
    val terms =
      (0 until bits).map(i => s"((($x >> $i) & 1) << ${2 * i})") ++
        (0 until bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }
}
