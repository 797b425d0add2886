package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view rewrite: a Catalyst optimizer rule that redirects an
  * aggregate over a base parquet table to a pre-aggregated MV when the MV
  * subsumes it — the classic warehouse "answer queries from summary
  * tables" optimization, and the 100 TB lever that turns a full-corpus
  * scan into a scan of a few thousand summary rows.
  *
  * Subsumption contract (deliberately minimal — SUM/COUNT re-aggregation
  * is the semantics that is EXACTLY correct by algebra, no estimation):
  *   - the query groups by a SUBSET of the MV's grouping columns, as
  *     plain column references (re-grouping coarser is exact: decimal
  *     sums re-associate, counts add);
  *   - every aggregate FUNCTION in the query is a plain `SUM(col)` over
  *     a column the MV pre-sums, or `COUNT(*)`/`COUNT(1)` (served by
  *     summing the MV's per-group row count) — but those functions may
  *     sit under arbitrary scalar expressions (casts, arithmetic),
  *     because the optimizer's CollapseProject folds post-aggregation
  *     projections INTO `Aggregate.aggregateExpressions` before this
  *     rule runs;
  *   - no DISTINCT, no FILTER clauses, no filter between the aggregate
  *     and the scan.
  *
  * The rewrite keeps the original output [[Attribute]]s (names, types,
  * exprIds): each AggregateExpression node is replaced by the MV
  * re-aggregation's column cast back to the original result type
  * (lossless — re-summing the MV's decimal(22,2) sums widens to
  * decimal(32,2) whose value equals the original decimal(22,2) sum),
  * and the surrounding scalar expression tree is preserved verbatim.
  *
  * Injected per session via `experimental.extraOptimizations` — the same
  * already-built-session route as [[AsOfJoinStrategy]]; queries register
  * it on a session CLONE so the shared driver session never sees it.
  */
case class MvRewriteRule(
    session: org.apache.spark.sql.classic.SparkSession,
    basePath: String,
    mvPlan: LogicalPlan,
    groupCols: Set[String],
    sumMap: Map[String, String],
    countCol: String) extends Rule[LogicalPlan] {

  /** Root path of a plain (possibly column-pruned) parquet scan. */
  private def scanPath(p: LogicalPlan): Option[String] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanPath(child)
    case l: LogicalRelation => l.relation match {
      case f: HadoopFsRelation => f.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    case _ => None
  }

  /** MV column that serves this aggregate function, if any. A
    * `SUM(CAST(col AS t))` is servable when the MV declared that exact
    * cast under the key "col#t" (the MV must have pre-summed the SAME
    * cast — matching by name alone would serve a different number). */
  private def mvColFor(ae: AggregateExpression): Option[String] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case s: Sum => s.child match {
        case ar: AttributeReference => sumMap.get(ar.name)
        case Cast(ar: AttributeReference, dt, _, _) =>
          sumMap.get(s"${ar.name}#${dt.simpleString}")
        case _ => None
      }
      case c: Count => c.children match {
        case Seq(Literal(_, _)) => Some(countCol)
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate if scanPath(agg.child).contains(basePath) &&
        agg.groupingExpressions.forall {
          case ar: AttributeReference => groupCols.contains(ar.name)
          case _ => false
        } => rewriteOrKeep(agg)
  }

  private def rewriteOrKeep(agg: Aggregate): LogicalPlan = {
    import org.apache.spark.sql.functions.{col, sum}
    val aes = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    val served = aes.map(ae => ae -> mvColFor(ae))
    if (aes.isEmpty || served.exists(_._2.isEmpty)) return agg

    val gNames = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference].name)
    val mvDf: DataFrame = GraftSqlBridge.ofRows(session, mvPlan)
    val reAgg = served.zipWithIndex.map { case ((_, mvc), i) =>
      sum(col(mvc.get)).as(s"__mv_$i")
    }
    // .optimizedPlan re-enters the optimizer on the MV subtree; this
    // rule no-ops there (the MV scan's path is not basePath), so the
    // recursion terminates after one level.
    val servedPlan = mvDf.groupBy(gNames.map(col): _*)
      .agg(reAgg.head, reAgg.tail: _*)
      .queryExecution.optimizedPlan
    val byName = servedPlan.output.map(a => a.name -> a).toMap
    def castTo(a: Attribute, t: org.apache.spark.sql.types.DataType): Expression =
      if (a.dataType == t) a else Cast(a, t, Option(conf.sessionLocalTimeZone))

    var remaining = served.zipWithIndex
    val rewritten: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val body = ne match {
        case Alias(child, _) => child
        case other => other
      }
      val nb = body.transformUp {
        case ae: AggregateExpression =>
          // consume occurrences in collection order (no dedup: each
          // occurrence got its own __mv_i column)
          val ((_, _), i) = remaining.head
          remaining = remaining.tail
          castTo(byName(s"__mv_$i"), ae.dataType)
        case ar: AttributeReference if groupCols.contains(ar.name) =>
          byName(ar.name)
      }
      Alias(nb, ne.name)(exprId = ne.exprId)
    }
    val out = Project(rewritten, servedPlan)
    // safety net: anything unresolved falls back to the original plan
    if (out.expressions.forall(_.references.subsetOf(servedPlan.outputSet)))
      out
    else agg
  }
}
