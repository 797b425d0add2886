package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package bridge: `classic.Dataset.ofRows` is `private[sql]`, and it is
  * the only supported way to wrap a custom [[LogicalPlan]] (graft's
  * [[graft.plans.AsOfJoinPlan]]) in a DataFrame. The standard pattern
  * for Spark extension libraries — one forwarding line, no behavior. */
object GraftSqlBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)

  /** Wrap an already-RESOLVED catalyst [[Expression]] as a [[Column]]
    * (`classic.ExpressionUtils.column` is `private[sql]`) — what the
    * SQL DML rules need to re-apply a DML statement's resolved
    * condition/assignment expressions onto the engine-built rewrite
    * frames without a lossy SQL-text round-trip. Same pattern as
    * Delta's `DeltaUDF`/expression re-use. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The inverse: a [[Column]]'s catalyst [[Expression]]
    * (`classic.ExpressionUtils.expression` is `private[sql]`) — what
    * the DML writers' metadata pruning needs to walk a caller-supplied
    * predicate against log-resident partition values / zone maps
    * before any data is scanned. The expression may be UNRESOLVED
    * (`col("x") === 5` yields an UnresolvedAttribute) — consumers
    * match by name, conservatively. */
  def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c) match {
      // the Column DSL yields a LAZY node wrapper; force the real
      // conversion so consumers see catalyst children (still possibly
      // unresolved — `===` arrives as UnresolvedFunction("="))
      case classic.ColumnNodeExpression(node) =>
        classic.ColumnNodeToExpressionConverter(node)
      case e => e
    }

  /** Drop the session catalog's cached data-source relations
    * (`sessionState.catalog` is `private[sql]`): a
    * `CREATE TABLE ... USING txlog` relation caches its FileIndex
    * snapshot at resolution, and `refreshByPath` only touches the
    * dataframe cache manager — after a DML/maintenance commit the
    * cached relation would keep serving the pre-commit version. */
  def invalidateRelationCache(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalog.invalidateAllCachedTables()

  /** Resolve a catalog-qualified multipart table name to its DSv2
    * [[org.apache.spark.sql.connector.catalog.Table]]
    * (`sessionState.catalogManager` is `private[sql]`) — what the
    * maintenance-statement commands (OPTIMIZE/VACUUM/DESCRIBE HISTORY)
    * need at run time. */
  def lookupV2Table(spark: SparkSession, nameParts: Seq[String])
      : org.apache.spark.sql.connector.catalog.Table = {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    require(nameParts.size >= 2,
      s"expected a catalog-qualified table name, got ${nameParts.mkString(".")}")
    val cm = spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager
    cm.catalog(nameParts.head) match {
      case tc: TableCatalog =>
        tc.loadTable(Identifier.of(
          nameParts.tail.init.toArray, nameParts.last))
      case other => throw new IllegalArgumentException(
        s"catalog ${nameParts.head} is not a TableCatalog: $other")
    }
  }

  /** The CATALOG PLUGIN registered under a name (`catalogManager` is
    * `private[sql]`) — what SHALLOW CLONE needs to resolve its
    * NOT-YET-EXISTING destination identifier to the directory it will
    * occupy (loadTable would throw NoSuchTable). */
  def catalogPlugin(spark: SparkSession, name: String)
      : org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager.catalog(name)

  /** Re-tag a batch plan's rows as a STREAMING DataFrame —
    * `internalCreateDataFrame(isStreaming = true)` is `private[sql]`
    * and is what every DSv1 streaming `Source.getBatch` must return
    * (MicroBatchExecution asserts `isStreaming`; Delta's source uses
    * the same call). Used by [[graft.sources.TxLogStreamSource]]. */
  def streamingFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse direction for a DSv1 streaming SINK's `addBatch`: the
    * frame a sink receives is streaming-tagged and cannot be handed to
    * batch writers directly — re-wrap its ALREADY-PLANNED execution
    * (`queryExecution.toRdd`, never a re-analysis that would re-read
    * the source) as a plain batch DataFrame. Rows are defensively
    * copied: whole-stage codegen reuses UnsafeRow buffers, and the
    * sink's write may buffer rows across iterator steps (Delta's
    * `DeltaSink` does the same copy for the same reason). */
  def sinkBatchFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema)
  }
}
