package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 32-bit hash — md5's first 4 bytes as an
  * unsigned long — fused into one codegen'd expression.
  *
  * Semantically identical to the composed form
  * `conv(substring(md5(c), 1, 8), 16, 10).cast("long")` (the first 8
  * hex chars ARE the first 4 digest bytes, big-endian), which is also
  * exactly what every DuckDB oracle computes as
  * `CAST('0x'||substr(md5(x),1,8) AS BIGINT)` — so hash-compared
  * results cannot change. The fusion removes the per-call 32-char hex
  * string allocation, substring, and base-16 reparse that the composed
  * form pays; this hash runs per TOKEN in the minhash/simhash/CMS
  * families, so the constant factor multiplies by corpus token count.
  * MD5 itself stays (it is the cross-engine portability contract).
  */
case class Hash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hash32 requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash32"

  override def nullSafeEval(input: Any): Any = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(
      input.asInstanceOf[UTF8String].getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("d")
      s"""
         |byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5($c.getBytes());
         |${ev.value} = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |  (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
