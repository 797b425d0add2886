package graft.sources

import java.io.File

import graft.core.TxLog
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEqualTo, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGe, LessThan => CLt, LessThanOrEqual => CLe, Literal, Or => COr}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("txlog")` — the transaction-log table format
  * ([[graft.core.TxLog]]) as a first-class Spark data source, the same
  * maturity step the blob connector took ([[BlobShardDataSource]]): the
  * lakehouse is usable from the reader API and SQL
  * (`CREATE TABLE t USING txlog OPTIONS (path '...')`), not only the
  * Scala API.
  *
  * Read options:
  *   - `versionAsOf`   → [[TxLog.read]] at that version;
  *   - `timestampAsOf` → [[TxLog.versionAt]] resolution (epoch millis
  *     or `yyyy-MM-dd HH:mm:ss[.fff]`), Delta's option names.
  *
  * Architecture (Delta's batch-read shape): the snapshot's live-file
  * list becomes a custom [[FileIndex]] under a [[HadoopFsRelation]]
  * with the stock parquet [[ParquetFileFormat]] — so the scan IS a
  * native vectorized parquet scan with column pruning, predicate
  * pushdown, and whole-stage codegen, and the connector's work is pure
  * PLAN-TIME file pruning:
  *
  *   - log-resident ZONE MAPS (`add`-line min/max triples —
  *     [[TxLog.fileStatsAll]]) prune files against the scan's data
  *     filters before any footer IO;
  *   - log-resident PARTITION VALUES (`p:` markers) prune on equality
  *     the same way.
  *
  * A snapshot carrying outstanding DELETION VECTORS (or an emptied
  * table) falls back to a row-level relation wrapping the merge-on-read
  * [[TxLog.read]] plan — correct on every snapshot, while the common
  * DV-free path keeps the native scan.
  *
  * WRITE path (`CreatableRelationProvider`):
  * `df.write.format("txlog").mode(m).save(dir)` maps onto the
  * transactional API — Append → [[TxLog.append]] (create when new),
  * Overwrite → [[TxLog.replace]] (one atomic commit swaps the live
  * set; the old state stays time-travelable), ErrorIfExists/Ignore per
  * their contracts. Writer options: `partitionBy=c1,c2` routes through
  * [[TxLog.appendPartitioned]] (log-line partition markers),
  * `statsBy=c1,c2` through [[TxLog.appendWithStats]] (zone-map
  * triples) — explicit options because DSv1 does not deliver the
  * DataFrameWriter's partitioning to the provider. Row-level DML
  * (delete/upsert/DV) stays on the Scala API, the same split Delta
  * had before SQL DML. */
class TxLogDataSource extends RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  /** STREAMING write (`df.writeStream.format("txlog").start(dir)`):
    * every micro-batch commits through [[TxLog.appendIdempotent]] with
    * the Spark batch id as the transaction id — a replayed batch
    * (checkpoint recovery re-delivers the last uncommitted-at-crash
    * batch) is recognized from the log's `txn` marker and SKIPPED, so
    * the sink is exactly-once BY PROTOCOL, not by best effort (the
    * Delta sink's `txnVersion` mechanism). The transaction app id is
    * the query's `checkpointLocation` option — the stable identity of
    * a logical stream across restarts — or an explicit
    * `option("txnAppId", ...)` when two checkpoints feed one table;
    * one of the two is REQUIRED (see createSink).
    * Append output mode only: Complete would need a replace-per-batch
    * marker protocol, and Update's upsert keys don't exist in DSv1. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"txlog sink supports Append output mode only, got $outputMode")
    require(partitionColumns.isEmpty,
      "txlog sink writes unpartitioned appends; use the batch writer's " +
        "option(\"partitionBy\", ...) for partition-marked commits")
    val dir = TxLogDataSource.localPath(parameters("path"))
    // NO per-table fallback id: two distinct streams (checkpoint set
    // via session conf or Spark's temp default, so absent from the
    // options map) would share it, and since both batch sequences
    // start at 0 the second stream's batches would be recognized as
    // replays and silently DROPPED (ADVICE r10) — refuse instead
    val appId = parameters.getOrElse("txnAppId",
      parameters.getOrElse("checkpointLocation",
        throw new IllegalArgumentException(
          "txlog sink needs a stable stream identity for its " +
            "exactly-once txn markers: set option(\"txnAppId\", ...) " +
            "or option(\"checkpointLocation\", ...) on the writer " +
            "(a checkpoint configured only via session conf is not " +
            "visible here, and a shared per-table default would " +
            "silently drop a second stream's batches as replays)")))
    new TxLogSink(dir, appId)
  }

  /** STREAMING read (`spark.readStream.format("txlog")`): tail the
    * table's commit log — each micro-batch is the files ADDED by the
    * versions in (lastOffset, currentVersion], i.e. the change data
    * feed consumed incrementally (the Delta streaming-source shape:
    * offsets are log versions, not file lists). Append-only contract
    * by default — a version carrying removes or deletion vectors fails
    * the stream (data a consumer already processed would silently
    * diverge); `option("ignoreChanges", "true")` opts into processing
    * such versions' adds anyway (rewritten rows re-emit — Delta's
    * documented semantics). `option("startingVersion", n)` skips
    * history below n (exclusive offset base n-1). */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val dir = TxLogDataSource.localPath(parameters("path"))
    val base = schema.getOrElse(
      TxLog.read(sqlContext.sparkSession, dir).schema)
    // STREAMING CDF (option("readChangeFeed", "true")): batches are
    // row-level changes, so the schema carries the two meta columns
    val cdf = parameters.get("readChangeFeed").exists(_.trim.toBoolean)
    ("txlog", if (!cdf) base
      else base.add("_change_type", org.apache.spark.sql.types.StringType,
          nullable = false)
        .add("_commit_version", org.apache.spark.sql.types.LongType,
          nullable = false))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val dir = TxLogDataSource.localPath(parameters("path"))
    // a RENAME/DROP COLUMN shifts column identity mid-stream — batches
    // before and after would disagree on what a name means. Delta
    // blocks streaming reads across column-mapping changes too.
    require(!TxLog.columnMapping(dir).active,
      s"streaming reads of $dir are unavailable after a RENAME or " +
        "DROP COLUMN (column mapping active) — read snapshots in batch")
    val (_, st) = sourceSchema(sqlContext, schema, providerName, parameters)
    new TxLogStreamSource(sqlContext, dir, st,
      parameters.get("startingVersion").map(_.trim.toInt).getOrElse(0),
      parameters.get("ignoreChanges").exists(_.trim.toBoolean),
      parameters.get("readChangeFeed").exists(_.trim.toBoolean),
      parameters.get("maxVersionsPerTrigger").map(_.trim.toInt),
      Some(metadataPath))
  }
  override def shortName(): String = "txlog"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    // the catalog URI-qualifies OPTIONS paths (`file:/tmp/...`);
    // TxLog's log protocol is java.io-local — unwrap the file scheme,
    // refuse remote ones explicitly rather than failing on a mangled
    // java.io.File of the URI string
    val dir = TxLogDataSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txlog source requires a path: spark.read.format(\"txlog\").load(dir)")))
    // DESCRIBE HISTORY surface: option("history", "true") returns the
    // commit log itself (version, commit instant, add/remove/DV line
    // counts; retired checkpoint-only versions carry -1 counts) —
    // metadata-grain, newest first via TxLog.history
    if (parameters.get("history").exists(_.trim.toBoolean))
      return new TxLogHistoryRelation(sqlContext, dir)
    // CHANGE DATA FEED surface: option("readChangeFeed", "true") with
    // startingVersion/endingVersion (Delta's option names) returns the
    // row-level change relation from [[TxLog.changeFeed]]
    if (parameters.get("readChangeFeed").exists(_.trim.toBoolean)) {
      val from = parameters.get("startingVersion").map(_.trim.toInt)
        .getOrElse(0)
      val to = parameters.get("endingVersion").map(_.trim.toInt)
        .getOrElse(TxLog.currentVersion(dir))
      return new TxLogCdfRelation(sqlContext, dir, from, to)
    }
    require(!(parameters.contains("versionAsOf") &&
      parameters.contains("timestampAsOf")),
      "versionAsOf and timestampAsOf are mutually exclusive")
    val asOf: Option[Int] = parameters.get("versionAsOf").map(_.trim.toInt)
      .orElse(parameters.get("timestampAsOf").map(ts =>
        TxLog.versionAt(dir, TxLogDataSource.parseInstant(ts))))
    val spark = sqlContext.sparkSession
    val version = asOf.getOrElse(TxLog.currentVersion(dir))
    val live = TxLog.snapshot(dir, Some(version))
    // `pinned` records whether the USER time-traveled (versionAsOf /
    // timestampAsOf) — the DML rule must refuse mutations through a
    // pinned relation, and `version == currentVersion` cannot tell
    // "pinned to what happens to be latest" from "default latest"
    // (review r11 #2.4)
    if (live.isEmpty || TxLog.hasDeletionVectors(dir, Some(version)) ||
        // column mapping: files store PHYSICAL names — the row relation
        // wraps TxLog.read's logical projection; a HadoopFsRelation
        // over the raw files would surface storage names
        TxLog.columnMapping(dir, Some(version)).active)
      new TxLogRowRelation(sqlContext, dir, Some(version),
        pinned = asOf.isDefined)
    else {
      // union schema over the live files (commits may evolve the schema
      // — q380): the log RECORDS it (schema lines), so serve it without
      // the footer-merge Spark job; legacy tables without a schema line
      // keep the mergeSchema inference
      val dataSchema = TxLog.tableSchema(dir, Some(version)).getOrElse(
        spark.read.option("mergeSchema", "true")
          .parquet(live.map(f => s"$dir/$f"): _*).schema)
      HadoopFsRelation(
        location = new TxLogFileIndex(dir, version, live,
          pinned = asOf.isDefined),
        partitionSchema = new StructType(),
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map("mergeSchema" -> "true"))(spark)
    }
  }

  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode._
    val dir = TxLogDataSource.localPath(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txlog writer requires a path: df.write.format(\"txlog\").save(dir)")))
    val exists = TxLog.currentVersion(dir) >= 0
    val partCols = parameters.get("partitionBy").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val statsCols = parameters.get("statsBy").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    require(partCols.isEmpty || statsCols.isEmpty,
      "partitionBy and statsBy are mutually exclusive per write")
    def appendLike(): Unit =
      if (partCols.nonEmpty)
        TxLog.appendPartitioned(data.sparkSession, data, dir, partCols): Unit
      else if (statsCols.nonEmpty)
        TxLog.appendWithStats(data.sparkSession, data, dir, statsCols): Unit
      else if (exists) TxLog.append(data, dir): Unit
      else TxLog.create(data, dir): Unit
    mode match {
      case Append => appendLike()
      case Overwrite =>
        require(partCols.isEmpty && statsCols.isEmpty,
          "partitionBy/statsBy writes are append-shaped; Overwrite " +
            "replaces the whole live set")
        TxLog.replace(data, dir): Unit
      case ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"txlog table already exists at $dir (SaveMode.ErrorIfExists)")
        appendLike()
      case Ignore => if (!exists) appendLike()
    }
    createRelation(sqlContext, parameters - "partitionBy" - "statsBy")
  }
}

/** The offset/admission logic SHARED between the DSv1 streaming source
  * ([[TxLogStreamSource]] — the path API) and the DSv2
  * [[TxLogMicroBatchStream]] (the catalog / `readStream.table` API):
  * one implementation, two connector generations (VERDICT r11 #2). */
private[graft] object TxLogOffsets {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  /** Highest version in (base, hi] BEFORE the first UNDECIDED
    * multi-table transaction: offering an undecided version would make
    * the consumer read it as empty and move past it — when the
    * transaction later publishes, those rows would be permanently
    * skipped (review r11 #2). The stream waits below it instead; an
    * operator decides a dead transaction with [[TxLog.abortTx]]. */
  def decidedThrough(dir: String, base: Int, hi: Int): Int = {
    var v = base + 1
    while (v <= hi && !TxLog.versionUndecided(dir, v)) v += 1
    v - 1
  }

  /** The next end offset past `base` under `limit`, clamped to the
    * AvailableNow drain target; None = no new data. The undecided scan
    * is clamped to the read-limit cap FIRST: versions beyond it cannot
    * be offered this trigger anyway, and scanning the whole backlog
    * per trigger is O(backlog²/cap) file IO over a capped drain
    * (review r11 #2.7). */
  def nextOffset(dir: String, base: Int, limit: ReadLimit,
      availableNowTarget: Int): Option[Int] = {
    val avail = math.min(TxLog.currentVersion(dir), availableNowTarget)
    val scanHi = limit match {
      case f: ReadMaxFiles =>
        math.min(avail, base + math.max(f.maxFiles(), 1))
      case _ => avail
    }
    val cur = decidedThrough(dir, base, scanHi)
    if (cur <= base) None else Some(cur)
  }

  /** The files ADDED by versions (from, to], with the append-only
    * guard: a version that deletes rows fails the stream unless
    * `ignoreChanges` opted into re-emission (Delta's semantics). */
  def addedFiles(dir: String, from: Int, to: Int,
      ignoreChanges: Boolean): Seq[String] =
    (from + 1 to to).flatMap { v =>
      val (adds, _) = try TxLog.changes(dir, v) catch {
        case _: java.nio.file.NoSuchFileException =>
          throw new IllegalStateException(
            s"streaming read needs raw log entries, but version $v of " +
              s"$dir was truncated below a checkpoint — start the stream " +
              "at a retained version (startingVersion)")
      }
      if (!ignoreChanges && TxLog.versionDeletes(dir, v))
        throw new IllegalStateException(
          s"version $v of $dir deletes rows (OPTIMIZE/DELETE/UPDATE/DV); " +
            "streaming reads are append-only — set ignoreChanges=true " +
            "to re-emit rewritten rows")
      adds
    }
}

object TxLogDataSource {
  /** Unwrap a possibly URI-qualified local path (see createRelation). */
  private[sources] def localPath(raw: String): String = {
    val uri = new org.apache.hadoop.fs.Path(raw).toUri
    Option(uri.getScheme) match {
      case None | Some("file") => uri.getPath
      case Some(s) => throw new IllegalArgumentException(
        s"txlog source reads local tables only, got scheme '$s'")
    }
  }

  /** `timestampAsOf` accepts epoch millis or a local timestamp string. */
  private[graft] def parseInstant(ts: String): Long =
    ts.trim.toLongOption.getOrElse(
      java.sql.Timestamp.valueOf(ts.trim).getTime)
}

/** The table's commit log as a streaming [[Source]]: offset = highest
  * committed version; `getBatch((a, b])` reads exactly the files the
  * versions a+1..b ADDED (one mergeSchema parquet scan over that file
  * list). Versions are immutable once committed, so replays after a
  * checkpoint recovery return identical batches — the exactly-once
  * property falls out of the log protocol. Raw entries must be
  * retained for the streamed range: history truncated below a
  * checkpoint refuses with the version number rather than silently
  * skipping it. */
class TxLogStreamSource(sqlContext: SQLContext, dir: String,
    declaredSchema: StructType, startingVersion: Int, ignoreChanges: Boolean,
    readChangeFeed: Boolean = false, maxVersionsPerTrigger: Option[Int] = None,
    metadataPath: Option[String] = None)
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxFiles}
  import org.apache.spark.sql.execution.streaming.Offset
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  override def schema: StructType = declaredSchema

  // ---- ADMISSION CONTROL (the KafkaSource pattern: a DSv1 Source
  // implementing the connector-level SupportsAdmissionControl /
  // SupportsTriggerAvailableNow interfaces — MicroBatchExecution
  // dispatches on the INTERFACE, not the source generation, so the
  // engine passes the checkpointed start offset and the read limit
  // into latestOffset and drives Trigger.AvailableNow through
  // prepareForTriggerAvailableNow). This closes the documented DSv1
  // gap (NOTES r10): AvailableNow + maxVersionsPerTrigger now DRAINS
  // the whole backlog in capped batches instead of stopping at the
  // first capped offer, and the engine-provided start offset makes a
  // capped offer below the checkpoint structurally impossible — the
  // hand-rolled checkpoint-parsing recovery in [[recoveredBase]] stays
  // only as the legacy-path guard for direct getOffset callers. ----

  /** Drain target snapshotted by [[prepareForTriggerAvailableNow]]:
    * Trigger.AvailableNow stops at the table state observed at query
    * start, even while new commits land. MaxValue = no snapshot
    * (processing-time / one-shot triggers). */
  @volatile private var availableNowTarget: Int = Int.MaxValue

  private def versionOfV2(o: OffsetV2): Int = o match {
    case LongOffset(v) => v.toInt
    case other => other.json().trim.toInt
  }

  override def initialOffset(): OffsetV2 =
    LongOffset((startingVersion - 1).toLong)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  /** The declared per-trigger limit: versions map onto
    * [[ReadLimit.maxFiles]] (a txlog version IS a file batch — the
    * same grain Delta's maxFilesPerTrigger caps). */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(math.max(n, 1)))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = TxLog.currentVersion(dir)
  }

  /** True latest (uncapped) for engine metrics/backlog reporting. */
  override def reportLatestOffset(): OffsetV2 = {
    val v = TxLog.currentVersion(dir)
    if (v < math.max(startingVersion, 0)) null else LongOffset(v.toLong)
  }

  /** The next batch's end offset: at most `limit` versions past the
    * engine-provided `start` (which IS the checkpointed offset on a
    * restart — no below-checkpoint offer is possible), clamped to the
    * AvailableNow drain target when one is snapshotted. Returning
    * `start` unchanged means "no new data". */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // a FRESH stream has no checkpointed offset — the engine passes
    // null, not initialOffset() (the KafkaSource contract)
    val base = if (start == null) startingVersion - 1 else versionOfV2(start)
    TxLogOffsets.nextOffset(dir, base, limit, availableNowTarget) match {
      case Some(v) => LongOffset(v.toLong)
      case None => start
    }
  }

  private def decidedThrough(base: Int, hi: Int): Int =
    TxLogOffsets.decidedThrough(dir, base, hi)

  /** Rate-limit base recovered from the checkpoint's offset log at
    * construction. A capped `getOffset` must NEVER fall below an
    * offset the engine already recorded — on a restart whose last
    * batch committed, the engine calls getOffset without any getBatch,
    * and a below-checkpoint offer would re-emit versions a downstream
    * sink already processed (an exactly-once break) or regress the
    * offset log. Absent/unparseable checkpoint state → `None`, and the
    * FIRST offer runs uncapped (safe: ≥ any committed offset); a fresh
    * stream's offsets dir is empty, so its first batch IS capped from
    * `startingVersion`. */
  private val recoveredBase: Option[Int] = metadataPath.flatMap { mp =>
    try {
      // metadataPath = <checkpoint>/sources/<i> → offsets live two up
      val od = new File(new File(mp).getParentFile.getParentFile, "offsets")
      val fs = Option(od.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.forall(_.isDigit))
      if (fs.isEmpty) Some(startingVersion - 1) // fresh stream
      else {
        // v1 offset file: line 1 "v1", line 2 batch metadata, line 3+
        // one offset json per source in index order — ours is the bare
        // version number at the index metadataPath ends with
        val idx = new File(mp).getName.toIntOption.getOrElse(0)
        val latest = fs.maxBy(_.getName.toLong)
        val lines = new String(
          java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8")
          .linesIterator.toSeq
        lines.drop(2 + idx).headOption.flatMap(_.trim.toIntOption)
        // parse failure → None → uncapped first offer, never a regression
      }
    } catch { case _: Throwable => None }
  }

  /** Highest version this instance has offered/delivered — the moving
    * base of the rate-limit window once batches flow. */
  @volatile private var deliveredThrough: Int =
    recoveredBase.getOrElse(Int.MinValue)

  /** LEGACY offer path (engines/tests driving the bare v1 contract —
    * an admission-control engine calls [[latestOffset]] instead, with
    * the checkpointed start offset supplied): with
    * `maxVersionsPerTrigger = n`, each micro-batch covers at most n
    * commits, and the cap never falls below the recovered checkpoint
    * base. */
  override def getOffset: Option[Offset] = {
    val cur = TxLog.currentVersion(dir)
    val base = if (deliveredThrough == Int.MinValue) startingVersion - 1
      else deliveredThrough
    // cap the scan window before walking it (see latestOffset)
    val scanHi = maxVersionsPerTrigger match {
      case Some(n) if deliveredThrough != Int.MinValue =>
        math.min(cur, deliveredThrough + math.max(n, 1))
      case _ => cur // no cap, or no safe base — never offer below a checkpoint
    }
    val v = decidedThrough(math.min(base, cur), scanHi)
    if (v < math.max(startingVersion, 0)) return None
    Some(LongOffset(v.toLong))
  }

  private def versionOf(o: Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case other => other.json().trim.toInt
  }

  override def getBatch(start: Option[Offset], end: Offset)
      : org.apache.spark.sql.DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion - 1)
    val to = versionOf(end)
    // a RENAME/DROP COLUMN landing mid-stream (after createSource's
    // guard passed) would silently null-backfill renamed columns in
    // later batches — fail the stream instead, like Delta
    require(!TxLog.columnMapping(dir, Some(to)).active,
      s"stream of $dir hit a RENAME/DROP COLUMN at or before version " +
        s"$to — restart consumers against the new schema in batch mode")
    deliveredThrough = math.max(deliveredThrough, to)
    val spark0 = sqlContext.sparkSession
    // CDF mode: the batch IS the change feed of the version interval —
    // deletes are first-class rows, so the append-only guard and
    // ignoreChanges do not apply here
    if (readChangeFeed) {
      val batch =
        if (from + 1 > to)
          spark0.createDataFrame(
            spark0.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            declaredSchema)
        else TxLog.changeFeed(spark0, dir, math.max(from + 1, 0), to)
          .select(declaredSchema.fieldNames
            .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      return org.apache.spark.sql.GraftSqlBridge.streamingFrame(spark0, batch)
    }
    val added = TxLogOffsets.addedFiles(dir, from, to, ignoreChanges)
    val spark = sqlContext.sparkSession
    val batch =
      if (added.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declaredSchema)
      else if (!TxLog.columnMapping(dir).active)
        // the declared schema IS the union schema (evolution is
        // add-nullable-only): an explicit-schema read null-fills absent
        // columns per file without mergeSchema's per-batch footer-merge
        // Spark job
        spark.read.schema(declaredSchema)
          .parquet(added.map(f => s"$dir/$f"): _*)
          .select(declaredSchema.fieldNames
            .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      else
        spark.read.option("mergeSchema", "true")
          .parquet(added.map(f => s"$dir/$f"): _*)
          .select(declaredSchema.fieldNames
            .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    // the engine asserts getBatch frames carry isStreaming=true
    org.apache.spark.sql.GraftSqlBridge.streamingFrame(spark, batch)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Exactly-once streaming sink over the transaction log: one
  * [[TxLog.appendIdempotent]] commit per micro-batch, keyed
  * `(appId, batchId)`. The incoming frame is streaming-tagged and
  * already planned — [[org.apache.spark.sql.GraftSqlBridge.sinkBatchFrame]]
  * re-wraps its physical rows as a batch frame so the staging write
  * runs WITHOUT re-executing the source (re-analysis of a streaming
  * plan inside addBatch is the classic DSv1 sink bug). A batch whose
  * txn marker is already in the log returns -1 from the append and is
  * dropped here — that replay is the normal checkpoint-recovery path,
  * not an error. */
class TxLogSink(dir: String, appId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    val spark = data.sparkSession
    val batch = org.apache.spark.sql.GraftSqlBridge.sinkBatchFrame(spark, data)
    TxLog.appendIdempotent(batch, dir, appId, batchId): Unit
  }
  override def toString: String = s"TxLogSink[$dir]"
}

/** Plan-time pruning accounting (the [[BlobShardIO]] pattern): in
  * local-mode tests the spec reads back how many files the last txlog
  * scan kept vs held — the ground truth behind the "zone maps prune
  * THROUGH the connector" pin. */
object TxLogSourceIO {
  val lastKept = new java.util.concurrent.atomic.AtomicInteger(0)
  val lastTotal = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The log-resident file statistics of one frozen snapshot, with the
  * conservative three-valued survival tests shared by BOTH pruning
  * fronts: the path connector's [[TxLogFileIndex]] (catalyst
  * `Expression` filters) and the catalog scan's
  * [[TxLogCatalogRelation]] (`sources.Filter` pushdown) — one
  * implementation, so the two read paths cannot drift. Only
  * provably-false files drop; any unrecognized shape keeps the file
  * (the parquet scan re-evaluates every filter). */
private[sources] class TxLogZoneMaps(dir: String, version: Int) {
  // ONE log fold feeds everything (review r12: the three per-map
  // accessors each replayed the log themselves)
  private val bundle = TxLog.pruneBundle(dir, Some(version))
  /** The snapshot's live files, log order. */
  val live: Seq[String] = bundle._1
  val stats: Map[String, Map[String, (Long, Long)]] = bundle._2
  val strStats: Map[String, Map[String, (String, String)]] = bundle._3
  val pvals: Map[String, Map[String, String]] = bundle._4

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** String literals arrive as UTF8String (catalyst) or String (source
    * filters); zone bounds compare in UTF8 BINARY order either way —
    * the order the stats writer used. */
  private def asU8(v: Any): Option[UTF8String] = v match {
    case u: UTF8String => Some(u)
    case s: String => Some(UTF8String.fromString(s))
    case _ => None
  }

  /** Recorded partition values are `cast(col AS string)` renderings —
    * integral/boolean/string literals render identically, so they all
    * prune; fractional types are excluded (formatting divergence risk
    * — conservative keep). */
  private def asPartStr(v: Any): Option[String] = v match {
    case u: UTF8String => Some(u.toString)
    case s: String => Some(s)
    case l: Long => Some(l.toString)
    case i: Int => Some(i.toString)
    case s: Short => Some(s.toString)
    case b: Byte => Some(b.toString)
    case b: Boolean => Some(b.toString)
    case _ => None
  }

  /** Equality survives if the zone map's [lo, hi] contains the value,
    * or the recorded partition value matches; no recorded metadata →
    * conservative keep. Partition pruning fires for any primitive
    * literal (VERDICT r12 #1: the string-only check left declared
    * integer partition columns unpruned). */
  def eqSurvives(file: String, col: String, v: Any): Boolean = {
    val zone = for {
      x <- asLong(v)
      (lo, hi) <- stats.getOrElse(file, Map.empty).get(col)
    } yield lo <= x && x <= hi
    val strZone = asU8(v).flatMap { u =>
      strStats.getOrElse(file, Map.empty).get(col).map { case (lo, hi) =>
        UTF8String.fromString(lo).compareTo(u) <= 0 &&
          u.compareTo(UTF8String.fromString(hi)) <= 0
      }
    }
    // a recorded __HIVE_DEFAULT_PARTITION__ is AMBIGUOUS (the dynamic
    // partition writer renders BOTH null and "" as the sentinel) — it
    // yields no information, so never prune on it: `WHERE c = ''` must
    // still reach the rows that really hold empty strings
    val part = asPartStr(v).flatMap(s =>
      pvals.getOrElse(file, Map.empty).get(col)
        .filter(_ != "__HIVE_DEFAULT_PARTITION__").map(_ == s))
    zone.getOrElse(true) && strZone.getOrElse(true) && part.getOrElse(true)
  }

  /** Range bound check against the long zone maps, or the string zone
    * maps when the literal is a string — `pred(loCmp, hiCmp)` receives
    * compareTo signs in the string case, so one rule serves both. */
  def boundSurvives(file: String, col: String)
      (pred: (Long, Long, Long) => Boolean)(v: Any): Boolean = {
    val long = for {
      x <- asLong(v)
      (lo, hi) <- stats.getOrElse(file, Map.empty).get(col)
    } yield pred(lo, hi, x)
    val str = asU8(v).flatMap { u =>
      strStats.getOrElse(file, Map.empty).get(col).map { case (lo, hi) =>
        pred(UTF8String.fromString(lo).compareTo(u).sign.toLong,
          UTF8String.fromString(hi).compareTo(u).sign.toLong, 0L)
      }
    }
    long.orElse(str).getOrElse(true)
  }
}

/** [[org.apache.spark.sql.sources.Filter]]-side survival walk (the
  * catalog scan's pushdown front of [[TxLogZoneMaps]]). */
private[sources] object TxLogFilterPrune {
  import org.apache.spark.sql.sources._

  def survives(z: TxLogZoneMaps, file: String, f: Filter): Boolean =
    f match {
      case And(l, r) => survives(z, file, l) && survives(z, file, r)
      case Or(l, r) => survives(z, file, l) || survives(z, file, r)
      case EqualTo(c, v) => z.eqSurvives(file, c, v)
      case In(c, vs) => vs.isEmpty || vs.exists(v => z.eqSurvives(file, c, v))
      case GreaterThan(c, v) =>
        z.boundSurvives(file, c)((lo, hi, x) => hi > x)(v)
      case GreaterThanOrEqual(c, v) =>
        z.boundSurvives(file, c)((lo, hi, x) => hi >= x)(v)
      case LessThan(c, v) =>
        z.boundSurvives(file, c)((lo, hi, x) => lo < x)(v)
      case LessThanOrEqual(c, v) =>
        z.boundSurvives(file, c)((lo, hi, x) => lo <= x)(v)
      case _ => true
    }
}

/** The snapshot's live files as a [[FileIndex]], with `listFiles`
  * applying log-resident zone maps and partition values against the
  * scan's data filters — Delta's `TahoeFileIndex` shape. The snapshot
  * is FROZEN at construction (file list, stats, partition values), so
  * a concurrent commit cannot tear this scan. */
class TxLogFileIndex(val dir: String, version: Int, live: Seq[String],
    val pinned: Boolean = false)
    extends FileIndex {

  private val zones = new TxLogZoneMaps(dir, version)
  private val statuses: Seq[(String, FileStatus)] = live.map { f =>
    val file = new File(dir, f)
    f -> new FileStatus(file.length(), false, 1, 64 << 20,
      file.lastModified(), new Path(file.toURI))
  }

  override def rootPaths: Seq[Path] = Seq(new Path(new File(dir).toURI))
  override def partitionSchema: StructType = new StructType()
  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = statuses.filter { case (name, _) =>
      dataFilters.forall(survives(name, _))
    }
    TxLogSourceIO.lastKept.set(kept.size)
    TxLogSourceIO.lastTotal.set(statuses.size)
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  /** Can `file` hold a row satisfying `e`? Conservative three-valued
    * pruning: only provably-false files drop; any unrecognized shape
    * keeps the file (the parquet scan re-evaluates every filter). */
  private def survives(file: String, e: Expression): Boolean = e match {
    case CAnd(l, r) => survives(file, l) && survives(file, r)
    case COr(l, r) => survives(file, l) || survives(file, r)
    case CEqualTo(a: AttributeReference, Literal(v, _)) =>
      eqSurvives(file, a.name, v)
    case CEqualTo(Literal(v, _), a: AttributeReference) =>
      eqSurvives(file, a.name, v)
    case CGt(a: AttributeReference, Literal(v, _)) =>
      boundSurvives(file, a.name)((lo, hi, x) => hi > x)(v)
    case CGe(a: AttributeReference, Literal(v, _)) =>
      boundSurvives(file, a.name)((lo, hi, x) => hi >= x)(v)
    case CLt(a: AttributeReference, Literal(v, _)) =>
      boundSurvives(file, a.name)((lo, hi, x) => lo < x)(v)
    case CLe(a: AttributeReference, Literal(v, _)) =>
      boundSurvives(file, a.name)((lo, hi, x) => lo <= x)(v)
    case CGt(Literal(v, _), a: AttributeReference) => // v > col ≡ col < v
      boundSurvives(file, a.name)((lo, hi, x) => lo < x)(v)
    case CGe(Literal(v, _), a: AttributeReference) =>
      boundSurvives(file, a.name)((lo, hi, x) => lo <= x)(v)
    case CLt(Literal(v, _), a: AttributeReference) =>
      boundSurvives(file, a.name)((lo, hi, x) => hi > x)(v)
    case CLe(Literal(v, _), a: AttributeReference) =>
      boundSurvives(file, a.name)((lo, hi, x) => hi >= x)(v)
    case _ => true
  }

  private def eqSurvives(file: String, col: String, v: Any): Boolean =
    zones.eqSurvives(file, col, v)

  private def boundSurvives(file: String, col: String)
      (pred: (Long, Long, Long) => Boolean)(v: Any): Boolean =
    zones.boundSurvives(file, col)(pred)(v)
}

/** `option("history", "true")`: the table's commit history as a
  * relation — the reader-API form of `DESCRIBE HISTORY`. Log-grain
  * metadata (one row per resolvable version), so a plain TableScan is
  * the honest plan at any table size. */
class TxLogHistoryRelation(override val sqlContext: SQLContext,
    dir: String) extends BaseRelation
    with org.apache.spark.sql.sources.TableScan {
  override def schema: StructType = new StructType()
    .add("version", org.apache.spark.sql.types.LongType, nullable = false)
    .add("instant_ms", org.apache.spark.sql.types.LongType, nullable = false)
    .add("n_adds", org.apache.spark.sql.types.LongType, nullable = false)
    .add("n_removes", org.apache.spark.sql.types.LongType, nullable = false)
    .add("n_dv", org.apache.spark.sql.types.LongType, nullable = false)
  override def buildScan(): RDD[Row] =
    sqlContext.sparkContext.parallelize(
      TxLog.history(dir).map { case (v, ts, a, r, dv) =>
        Row(v.toLong, ts, a.toLong, r.toLong, dv.toLong)
      }, 1)
}

/** The change data feed as a relation (`option("readChangeFeed",
  * "true")`): wraps [[TxLog.changeFeed]] behind a pruned row scan, the
  * same execution shape as [[TxLogRowRelation]] — filters re-evaluated
  * by Spark, column pruning honored (a consumer reading only keys +
  * `_change_type` never materializes the wide columns). */
class TxLogCdfRelation(override val sqlContext: SQLContext, dir: String,
    from: Int, to: Int) extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession
  // ONE feed build serves schema + scan: changeFeed replays log state
  // for the whole range, and building it twice doubled that driver IO
  // (ADVICE r10)
  private lazy val feed = TxLog.changeFeed(spark, dir, from, to)
  override lazy val schema: StructType = feed.schema
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val df = feed
    val pruned =
      if (requiredColumns.isEmpty) df
      else df.select(requiredColumns.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** Fallback relation for DV-bearing, emptied, or COLUMN-MAPPED
  * snapshots: wraps the merge-on-read [[TxLog.read]] plan (parquet
  * scan anti-joined against the deletion-vector frame, physical names
  * projected back to logical) behind a pruned row scan. Filters do
  * double duty: they prune FILES through the log-resident zone maps
  * (the same [[TxLogFilterPrune]] walk the catalog scan runs) and
  * re-apply on the wrapped frame so Catalyst pushes them into the
  * parquet scan — Spark still re-evaluates every row above (the DSv1
  * contract), so an untranslatable filter only costs the skipped
  * pushdown, never correctness. */
class TxLogRowRelation(override val sqlContext: SQLContext,
    val dir: String, val asOf: Option[Int], val pinned: Boolean = false)
    extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession
  override lazy val schema: StructType = TxLog.read(spark, dir, asOf).schema

  // rows come straight out of the wrapped plan's execution — already
  // InternalRow, no Row re-conversion
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    // pin the version once: prune decision and read must see the SAME
    // snapshot (the catalog relation learned this in review r12 #1)
    val version = asOf.getOrElse(TxLog.currentVersion(dir))
    val zones = new TxLogZoneMaps(dir, version)
    val live = zones.live
    val kept =
      if (filters.isEmpty || live.isEmpty) live
      else live.filter(f =>
        filters.forall(TxLogFilterPrune.survives(zones, f, _)))
    val base =
      if (live.isEmpty || kept.size == live.size)
        TxLog.read(spark, dir, Some(version))
      else if (kept.isEmpty)
        TxLog.read(spark, dir, Some(version)).limit(0)
      else TxLog.readPruned(spark, dir, kept, Some(version))
    val filtered = filters
      .flatMap(f => scala.util.Try(TxLogFilterColumns.toColumn(f)).toOption)
      .foldLeft(base)(_ filter _)
    val pruned =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
