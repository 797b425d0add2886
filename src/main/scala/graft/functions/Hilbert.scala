package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 2-D Hilbert-curve position — the OTHER space-filling curve a
  * lakehouse layout optimizer offers next to z-order (ZOrder.scala):
  * Hilbert never takes the long diagonal jumps Morton order does at
  * power-of-two boundaries, so consecutive curve positions are always
  * grid-ADJACENT and file bounding boxes come out tighter on the same
  * data (q361 materializes that comparison; the win grows with file
  * count at 100 TB).
  *
  * `graft_hilbert2(x, y)` maps the LOW 16 BITS of each bigint input
  * (callers bound coordinates into [0, 65536), the graft_zorder2
  * contract) to the position d ∈ [0, 2^32) along the order-16 Hilbert
  * curve, via the canonical bit-descent (the public-domain xy2d form:
  * per bit-plane s from the top: quadrant = (3·rx) XOR ry, accumulate
  * s²·quadrant, then reflect/transpose the frame). A static helper
  * shared by interpreted eval and generated code keeps per-row work
  * inside whole-stage codegen (the ZOrder2D pattern).
  *
  * The oracle side cannot call this expression AND cannot unroll the
  * stateful descent into one scalar expression (each step rewrites
  * x/y), so query SQL carries the loop as a 16-step RECURSIVE CTE
  * generated from [[Hilbert.sqlCte]] — one definition, two engines,
  * engine-vs-engine on the arithmetic.
  */
case class Hilbert2D(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert2 requires two bigint arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert2"

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Hilbert.xy2d($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {

  /** Bits per dimension: 16 each → a 32-bit curve position, matching
    * the ZOrder grid so q361 compares the two curves on one geometry. */
  val bits: Int = 16
  val side: Long = 1L << bits // 65536

  /** Canonical Hilbert xy2d bit-descent. Static entry point shared by
    * interpreted eval and generated code. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & (side - 1)
    var y = yIn & (side - 1)
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = side - 1 - x
          y = side - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → (x, y)) — test-side only: ZOrderSpec uses it to
    * pin the round trip and the unit-step adjacency property that IS
    * the Hilbert locality claim. Canonical d2xy form. */
  def d2xy(dIn: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    while (s < side) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** The same descent as a portable RECURSIVE CTE body: given a CTE
    * `src` with columns (`key`, `x`, `y`), emits a WITH-fragment whose
    * final relation `hd` has (`key`, `hd.d`) = Hilbert position. The
    * per-step case analysis mirrors xy2d exactly: new x/y are the
    * reflect+transpose of the frame, d accumulates s²·((3rx) XOR ry).
    * Used to GENERATE oracle SQL so both engines compute one
    * definition (NOTES rule 7). Dialect knobs cover the two engines'
    * spellings (DuckDB: `//`, `xor()`; Spark: `DIV`, `^`) — ZOrderSpec
    * runs the SPARK spelling against the native expression, so the
    * generated loop itself is pinned engine-vs-engine in CI on top of
    * q361's per-round gate. */
  def sqlCte(src: String, intDiv: String = "//",
      xor: (String, String) => String = (a, b) => s"xor($a, $b)"): String =
    s"""h(key, x, y, s, d) AS (
       |  SELECT key, CAST(x AS BIGINT), CAST(y AS BIGINT),
       |    CAST(${side / 2} AS BIGINT), CAST(0 AS BIGINT) FROM $src
       |  UNION ALL
       |  SELECT key,
       |    CASE WHEN (y & s) != 0 THEN x
       |         WHEN (x & s) != 0 THEN ${side - 1} - y
       |         ELSE y END,
       |    CASE WHEN (y & s) != 0 THEN y
       |         WHEN (x & s) != 0 THEN ${side - 1} - x
       |         ELSE x END,
       |    s $intDiv 2,
       |    d + s * s * ${xor("3 * CASE WHEN (x & s) != 0 THEN 1 ELSE 0 END",
             "CASE WHEN (y & s) != 0 THEN 1 ELSE 0 END")}
       |  FROM h WHERE s > 0),
       |hd AS (SELECT key, d FROM h WHERE s = 0)""".stripMargin
}
