package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package bridge: `classic.Dataset.ofRows` is `private[sql]`, and it is
  * the only supported way to wrap a custom [[LogicalPlan]] (graft's
  * [[graft.plans.AsOfJoinPlan]]) in a DataFrame. The standard pattern
  * for Spark extension libraries — one forwarding line, no behavior. */
object GraftSqlBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
