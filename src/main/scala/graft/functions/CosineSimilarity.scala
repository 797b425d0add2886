package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst cosine similarity over two `array<float>` or
  * `array<double>` columns (sides may mix — e.g. float corpus vectors
  * against double learned-centroid means in q56's Lloyd iterations,
  * which otherwise fall back to the interpreted HOF path).
  *
  * The composable form ([[Vectors.cosine]]) builds three zip_with arrays
  * and folds each — correct, but it allocates intermediates per row and
  * evaluates lambdas interpreted. This expression is the perf path the
  * extension mandate calls for (custom `Expression` with `doGenCode`
  * beats a UDF): one fused loop, no allocation, stays inside whole-stage
  * codegen.
  *
  * Numerics are IDENTICAL to the HOF form and the DuckDB oracle: floats
  * widen to double before multiplying, and dot/norm accumulators fold in
  * index order — so hash-compared results don't change when queries switch
  * between the two implementations.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(elemType(_).isDefined))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  @transient private lazy val leftFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $getX;
         |  double $yv = $getY;
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over `array<float|double>` columns — the
  * [[CosineSimilarity]] loop without the norms. Exists for the hot
  * paths that fold MANY dots per row (q41 evaluates one per hyperplane
  * per vector), where the interpreted zip_with+aggregate lambda cost
  * multiplies. Index-order double accumulation — bit-identical to
  * [[Vectors.dot]] and the oracle's list_sum(list_transform(...)). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (Seq(left, right).forall(elemType(_).isDefined))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  @transient private lazy val leftFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($getX) * ($getY);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  private[functions] val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "", "graft_cosine",
    "graft_cosine(a, b) - cosine similarity of two float/double vectors",
    "", "", "", "", "", "", "built-in")

  private[functions] val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, "", "graft_dot",
    "graft_dot(a, b) - dot product of two float/double vectors",
    "", "", "", "", "", "", "built-in")

  private[functions] val hash32Info = new ExpressionInfo(
    classOf[Hash32].getName, "", "graft_hash32",
    "graft_hash32(s) - md5-prefix portable 32-bit hash as bigint",
    "", "", "", "", "", "", "built-in")

  // Spark ships codegen'd bloom-filter expressions (used internally for
  // runtime row-filter joins) but does NOT SQL-register them; exposing
  // them through the same registry path as our own natives replaces the
  // one per-row membership UDF the repo had (q116) with whole-stage
  // codegen and a plan-shipped literal filter.
  private[functions] val bloomAggInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
    "", "graft_bloom_agg",
    "graft_bloom_agg(xxhash64(x), n_items, n_bits) - bloom filter of a column as binary",
    "", "", "", "", "", "", "built-in")

  private[functions] val jaroWinklerInfo = new ExpressionInfo(
    classOf[JaroWinklerSimilarity].getName, "", "graft_jaro_winkler",
    "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (DuckDB-parity semantics)",
    "", "", "", "", "", "", "built-in")

  private[functions] val topKInfo = new ExpressionInfo(
    classOf[TopKAgg].getName, "", "graft_topk",
    "graft_topk(x, k) - per-group top-k doubles (descending) as a bounded-state aggregate",
    "", "", "", "", "", "", "built-in")

  private[functions] val zorder2Info = new ExpressionInfo(
    classOf[ZOrder2D].getName, "", "graft_zorder2",
    "graft_zorder2(x, y) - 2-D Morton (z-order) bit interleave of two 16-bit coords",
    "", "", "", "", "", "", "built-in")

  private[functions] val hilbert2Info = new ExpressionInfo(
    classOf[Hilbert2D].getName, "", "graft_hilbert2",
    "graft_hilbert2(x, y) - order-16 2-D Hilbert curve position of two 16-bit coords",
    "", "", "", "", "", "", "built-in")

  private[functions] val mightContainInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
    "", "graft_might_contain",
    "graft_might_contain(bloom, xxhash64(x)) - bloom membership probe",
    "", "", "", "", "", "", "built-in")

  /** Idempotent registration into an existing session (used by
    * SparkEntry.configure so driver-built sessions get the functions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash32", exprs => Hash32(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", exprs =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinklerSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKAgg(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder2", exprs => ZOrder2D(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hilbert2", exprs => Hilbert2D(exprs(0), exprs(1)), "built-in")
  }
}

/** `SparkSessionExtensions` hook: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * spark.sql.extensions=graft.functions.GraftExtensions) get the native
  * functions without any per-session registration call. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      GraftFunctions.cosineInfo,
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      GraftFunctions.dotInfo,
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash32"),
      GraftFunctions.hash32Info,
      (exprs: Seq[Expression]) => Hash32(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      GraftFunctions.bloomAggInfo,
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      GraftFunctions.mightContainInfo,
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      GraftFunctions.jaroWinklerInfo,
      (exprs: Seq[Expression]) => JaroWinklerSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      GraftFunctions.topKInfo,
      (exprs: Seq[Expression]) => TopKAgg(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder2"),
      GraftFunctions.zorder2Info,
      (exprs: Seq[Expression]) => ZOrder2D(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert2"),
      GraftFunctions.hilbert2Info,
      (exprs: Seq[Expression]) => Hilbert2D(exprs(0), exprs(1))))
  }
}
