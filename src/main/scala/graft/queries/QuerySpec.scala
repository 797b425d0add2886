package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named Spark query over the driver
  * corpus plus (when SQL-expressible) the exactly-equivalent DuckDB oracle
  * SQL. Column names/types and row order must match between the two — the
  * driver hash-compares (SURVEY §5.1). */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Per-process scratch roots for queries that build side tables
  * (TxLog tables, partitioned/bucketed writes, materialized views).
  * Keyed by (prefix, corpus dir) for within-process reuse AND by the
  * process id: two concurrent drivers gating the same corpus would
  * otherwise race on one directory while one of them is deleting log
  * entries (ADVICE r9 on q404/q405 — the hashCode-only path). */
object Scratch {
  def dir(prefix: String, corpusDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${prefix}_${Integer.toHexString(corpusDir.hashCode)}_p" +
        ProcessHandle.current().pid()).toString
}
