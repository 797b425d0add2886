package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed readers over the driver corpus (/root/repo/TESTDATA.md) plus the
  * reference's CSV source conventions.
  *
  * Reference analog: every DAG re-reads one wide denormalized CSV per task
  * with pandas (`airflow/dags/CompleteETL.py:20` and 15 clones) and ships
  * the whole dataset as JSON between tasks. Here a table is one lazy scan;
  * Catalyst prunes columns and pushes predicates into the Parquet reader,
  * so at 100 TB only the referenced columns/row-groups are read.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Corpus-table schemas, memoized per (canonical path, file-metadata
    * fingerprint) — a bare `spark.read.parquet(path)` runs a SPARK JOB
    * per load just to infer the schema (ParquetFileFormat.inferSchema →
    * mergeSchemasInParallel, even with mergeSchema off; stack-sampled
    * in optimization r14), and queries call [[load]] 1–5 times each.
    * Passing the memoized schema skips that job entirely. This is
    * METADATA caching (what a catalog/metastore does), not result
    * caching: every fresh JVM re-reads footers on first touch, and the
    * fingerprint (name/size/mtime of the data files — filesystem
    * metadata only, ~1 ms) invalidates the entry when a test fixture
    * regenerates a table at the same path. */
  private val schemaMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), StructType]

  private def dirFingerprint(path: java.nio.file.Path): String =
    try {
      if (!java.nio.file.Files.exists(path)) s"absent:$path"
      else if (java.nio.file.Files.isRegularFile(path))
        s"${java.nio.file.Files.size(path)}:" +
          java.nio.file.Files.getLastModifiedTime(path).toMillis
      else {
        val s = java.nio.file.Files.list(path)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(p => s"${p.getFileName}:" +
              (try s"${java.nio.file.Files.size(p)}:" +
                java.nio.file.Files.getLastModifiedTime(p).toMillis
               catch { case _: Throwable => "?" }))
            .toSeq.sorted.mkString(",")
        } finally s.close()
      }
    } catch { case _: Throwable => s"unreadable:$path" }

  private[graft] def schemaOf(spark: SparkSession, path: String): StructType = {
    val p = java.nio.file.Paths.get(path).toAbsolutePath.normalize()
    schemaMemo.getOrElseUpdate((p.toString, dirFingerprint(p)),
      spark.read.parquet(path).schema)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.schema(schemaOf(spark, path)).parquet(path)
    if (name == "events") normalizeTs(df) else df
  }

  /** Read a WITHIN-PROCESS-IMMUTABLE parquet directory (memoized
    * artifacts, event relays) under the memoized schema — same
    * inference-job skip as [[load]], same fingerprint invalidation. */
  def readStable(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schemaOf(spark, path)).parquet(path)

  /** `events.ts` arrives in whatever physical type the corpus generator
    * chose that round; normalize every variant to session-local
    * TimestampType (UTC session) so downstream event-time logic — windows,
    * watermarks, unix_micros — sees one type:
    *   - nanosecond parquet read as Long (spark.sql.legacy.parquet
    *     .nanosAsLong): integer-division truncation to µs, the same
    *     truncation DuckDB applies casting TIMESTAMP_NS to TIMESTAMP;
    *   - µs parquet without isAdjustedToUTC (Spark infers TIMESTAMP_NTZ):
    *     cast to TimestampType — under the UTC session timezone the
    *     wall-clock reinterpretation is the identity on the stored µs,
    *     matching DuckDB's naive TIMESTAMP read bit for bit.
    *
    * ONE definition serves batch ([[load]]) and streaming
    * ([[graft.streaming.StreamQueries]] `eventStream`): the rules were
    * previously duplicated and kept in sync only by comments (ADVICE r5)
    * — a physical variant added to one side would have silently diverged
    * stream vs batch event-time semantics. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _        => df
    }

  /** Adaptive scan fan-out for per-row-HEAVY aggregation inputs (many
    * decimal sums, percentile buffers): if the scan already yields at
    * least half the session's shuffle parallelism — every real multi-
    * row-group dataset, so all of production — this is the IDENTITY and
    * no shuffle is added. Only when the scan is narrower (the fixture's
    * single-row-group files plan as ONE task, serializing the whole
    * partial aggregate) does it repartition to restore parallelism.
    * Callers must project to the needed columns FIRST so the conditional
    * exchange moves minimal bytes. Only sound above order-independent
    * aggregates (the Stable decimal discipline — which hash-gated
    * queries already require). Measured on q189 at sf0.1: 2.7→1.3 s.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val parts = df.rdd.getNumPartitions // plans the scan; runs no job
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (parts * 2 >= target) df else df.repartition(target)
  }

  /** Reference CSV conventions (SURVEY §2.1 S1/S2): header row, explicit
    * schema (never inferred in production paths), and the Ergast `\N` null
    * sentinel handled declaratively at the source — one option replacing
    * ~10 hand-rolled per-row checks in the reference (e.g.
    * `airflow/dags/fpractice_etl.py:17`, `CompleteETL.py:851-853`). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)
}
