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
  * DV-free path keeps the native scan. Read-only by design: writes go
  * through the transactional Scala API (`create/append/upsert/...`),
  * the same split Delta had before SQL DML. */
class TxLogDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "txlog"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val raw = parameters.getOrElse("path", throw new IllegalArgumentException(
      "txlog source requires a path: spark.read.format(\"txlog\").load(dir)"))
    // the catalog URI-qualifies OPTIONS paths (`file:/tmp/...`);
    // TxLog's log protocol is java.io-local — unwrap the file scheme,
    // refuse remote ones explicitly rather than failing on a mangled
    // java.io.File of the URI string
    val dir = {
      val uri = new org.apache.hadoop.fs.Path(raw).toUri
      Option(uri.getScheme) match {
        case None | Some("file") => uri.getPath
        case Some(s) => throw new IllegalArgumentException(
          s"txlog source reads local tables only, got scheme '$s'")
      }
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
    if (live.isEmpty || TxLog.hasDeletionVectors(dir, Some(version)))
      new TxLogRowRelation(sqlContext, dir, Some(version))
    else {
      // union schema over the live files (commits may evolve the schema
      // — q380): per-file footer metadata IO, plan-time only
      val dataSchema = spark.read.option("mergeSchema", "true")
        .parquet(live.map(f => s"$dir/$f"): _*).schema
      HadoopFsRelation(
        location = new TxLogFileIndex(dir, version, live),
        partitionSchema = new StructType(),
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map("mergeSchema" -> "true"))(spark)
    }
  }
}

object TxLogDataSource {
  /** `timestampAsOf` accepts epoch millis or a local timestamp string. */
  private[sources] def parseInstant(ts: String): Long =
    ts.trim.toLongOption.getOrElse(
      java.sql.Timestamp.valueOf(ts.trim).getTime)
}

/** Plan-time pruning accounting (the [[BlobShardIO]] pattern): in
  * local-mode tests the spec reads back how many files the last txlog
  * scan kept vs held — the ground truth behind the "zone maps prune
  * THROUGH the connector" pin. */
object TxLogSourceIO {
  val lastKept = new java.util.concurrent.atomic.AtomicInteger(0)
  val lastTotal = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The snapshot's live files as a [[FileIndex]], with `listFiles`
  * applying log-resident zone maps and partition values against the
  * scan's data filters — Delta's `TahoeFileIndex` shape. The snapshot
  * is FROZEN at construction (file list, stats, partition values), so
  * a concurrent commit cannot tear this scan. */
class TxLogFileIndex(dir: String, version: Int, live: Seq[String])
    extends FileIndex {

  private val stats: Map[String, Map[String, (Long, Long)]] =
    TxLog.fileStatsAll(dir, Some(version))
  private val pvals: Map[String, Map[String, String]] =
    TxLog.partitionValues(dir, Some(version))
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

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** Equality survives if the zone map's [lo, hi] contains the value
    * (integral columns) or the recorded partition value matches
    * (string columns); no recorded metadata → conservative keep. */
  private def eqSurvives(file: String, col: String, v: Any): Boolean = {
    val zone = for {
      x <- asLong(v)
      (lo, hi) <- stats.getOrElse(file, Map.empty).get(col)
    } yield lo <= x && x <= hi
    val part = v match {
      case u: UTF8String =>
        pvals.getOrElse(file, Map.empty).get(col).map(_ == u.toString)
      case _ => None
    }
    zone.getOrElse(true) && part.getOrElse(true)
  }

  private def boundSurvives(file: String, col: String)
      (pred: (Long, Long, Long) => Boolean)(v: Any): Boolean =
    (for {
      x <- asLong(v)
      (lo, hi) <- stats.getOrElse(file, Map.empty).get(col)
    } yield pred(lo, hi, x)).getOrElse(true)
}

/** Fallback relation for DV-bearing or emptied snapshots: wraps the
  * merge-on-read [[TxLog.read]] plan (parquet scan anti-joined against
  * the deletion-vector frame) behind a pruned row scan. Filters are
  * left to Spark (the DSv1 contract re-evaluates unhandled filters);
  * column pruning is honored so the anti-join carries only the
  * requested columns plus the join metadata. */
class TxLogRowRelation(override val sqlContext: SQLContext, dir: String,
    asOf: Option[Int]) extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession
  override lazy val schema: StructType = TxLog.read(spark, dir, asOf).schema

  // rows come straight out of the wrapped plan's execution — already
  // InternalRow, no Row re-conversion
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val df = TxLog.read(spark, dir, asOf)
    val pruned =
      if (requiredColumns.isEmpty) df
      else df.select(requiredColumns.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
