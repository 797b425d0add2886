package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for the engine's packed blob shards — the
  * WebDataset-style media layout q246 computes offsets for: each
  * `shard-N.bin` is a sequence of records `[doc_id:int64 LE]
  * [length:int32 LE][blob bytes]`, written in doc_id order by
  * [[BlobShards.pack]]. The layout a 100 TB multimodal corpus actually
  * ships in — large sequential files a training loader streams — made
  * first-class to the engine:
  *
  *   - one InputPartition PER SHARD FILE → scan parallelism = shard
  *     count, no coordination;
  *   - `shard = N` / `shard IN (...)` predicates are PUSHED DOWN to the
  *     file listing — pruned shards are never opened (the partition-
  *     pruning behavior q225 proves for parquet, for a custom format);
  *   - COLUMN PRUNING is honored physically: when `media` is not in the
  *     required schema the reader `skip()`s the blob bytes instead of
  *     materializing them — a metadata query does header-sized IO, not
  *     corpus-sized.
  *
  * Usage: `spark.read.format(classOf[BlobShardDataSource].getName)
  *   .option("path", dir).load()` with schema
  *   (shard INT, doc_id LONG, offset LONG, length INT, media BINARY).
  */
class BlobShardDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlobShardDataSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlobShardTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object BlobShardDataSource {
  val fullSchema: StructType = new StructType()
    .add("shard", IntegerType, nullable = false)
    .add("doc_id", LongType, nullable = false)
    .add("offset", LongType, nullable = false)
    .add("length", IntegerType, nullable = false)
    .add("media", BinaryType, nullable = false)
}

class BlobShardTable(path: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-shards source requires option(\"path\", dir)")
  override def name(): String = s"graft_shards($path)"
  override def schema(): StructType = BlobShardDataSource.fullSchema
  // ACCEPT_ANY_SCHEMA: writers supply (shard, doc_id, media) — offset and
  // length are POSITIONS, derived by the reader from the framing, so the
  // write schema is legitimately a subset of the read schema.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlobShardScanBuilder(path,
      Option(options.get("maxBytesPerBatch")).map(_.toLong))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new BlobShardWriteBuilder(path, info.schema())
}

/** Executor-side IO accounting for the shard readers (local-mode test
  * aid: in `local[*]` the executors share the test JVM, so specs can
  * assert "this plan opened N shard files / zero shard files" — the
  * ground-truth check behind the aggregate-pushdown and runtime-
  * filtering pins; production multi-JVM deployments would read the
  * same signal from task metrics). */
object BlobShardIO {
  val opened = new java.util.concurrent.atomic.AtomicLong(0L)
  val records = new java.util.concurrent.atomic.AtomicLong(0L)
}

class BlobShardScanBuilder(path: String,
    maxBytesPerBatch: Option[Long] = None) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var required: StructType = BlobShardDataSource.fullSchema
  private var shardFilter: Option[Set[Int]] = None
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[(StructType, Array[Array[Any]], String)] = None
  private var pushedLimit: Option[Int] = None

  /** LIMIT pushdown: each shard reader stops after `limit` records —
    * a bare LIMIT needs any N rows, so reading each file's head is
    * sufficient. PARTIAL pushdown (the default): Spark still applies
    * the global limit over the per-shard heads. */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(pushedLimit.fold(limit)(math.min(_, limit)))
    true
  }

  /** TopN pushdown — honored ONLY for (doc_id ASC): the write
    * contract sorts every shard by doc_id, so the first N records of
    * each file ARE its N smallest doc_ids; the reader early-stops and
    * Spark merges the per-shard heads (partial pushdown). Any other
    * ordering is refused and evaluated by Spark over the full scan. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    val ok = orders.length == 1 && (orders(0).expression() match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference =>
        n.fieldNames.sameElements(Array("doc_id")) &&
          orders(0).direction() ==
            org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
      case _ => false
    })
    if (ok) pushedLimit = Some(pushedLimit.fold(limit)(math.min(_, limit)))
    ok
  }

  // per-shard heads only — Spark applies the global limit/merge
  override def isPartiallyPushed(): Boolean = true

  /** AGGREGATE PUSHDOWN from the `_manifest` sidecar: COUNT(*) /
    * COUNT(col) / SUM(length), optionally grouped by `shard`, are pure
    * manifest arithmetic (records, fileBytes − 12·records) — answered
    * with ZERO shard-file IO, the way a parquet footer answers
    * count(*). Only offered when the manifest is EXACT: the visible
    * shard files (after shard-predicate pruning) and the manifest
    * entries must agree set-wise with matching file lengths — an
    * externally appended/truncated/unmanifested file withdraws the
    * pushdown and the plan falls back to a real scan. Complete
    * pushdown (Spark re-aggregates nothing), so the group rows are
    * final results; correctness is oracle-checked in q277 and the
    * zero-IO claim is pinned by BlobSourceSpec via [[BlobShardIO]]. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = planAggregation(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = planAggregation(agg) match {
    case Some(p) => pushedAgg = Some(p); true
    case None    => false
  }

  private def fieldOf(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference
          if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
      case _ => None
    }

  private def planAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Array[Any]], String)] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Sum}
    val byShard = agg.groupByExpressions().toSeq match {
      case Seq()  => false
      case Seq(g) if fieldOf(g).contains("shard") => true
      case _      => return None
    }
    val cols = BlobShardDataSource.fullSchema.fieldNames.toSet
    // 'c' = records, 's' = Σ length (bytes − 12·records), 'd'/'D' =
    // min/max doc_id (v2 manifest bounds), 'h'/'H' = min/max shard
    import org.apache.spark.sql.connector.expressions.aggregate.{Max, Min}
    val funcs: Seq[Char] = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => 'c'
      case c: Count if !c.isDistinct &&
        fieldOf(c.column).exists(cols.contains) => 'c' // all columns non-null
      case s: Sum if !s.isDistinct &&
        fieldOf(s.column).contains("length") => 's'
      case m: Min if fieldOf(m.column).contains("doc_id") => 'd'
      case m: Max if fieldOf(m.column).contains("doc_id") => 'D'
      case m: Min if fieldOf(m.column).contains("shard") => 'h'
      case m: Max if fieldOf(m.column).contains("shard") => 'H'
      case _ => return None
    }
    if (funcs.isEmpty) return None
    val manifest = BlobShardManifest.read(path)
    if (manifest.isEmpty) return None
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
      .map(f => f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt -> f)
      .filter { case (s, _) => shardFilter.forall(_.contains(s)) }
      .toMap
    val entries = manifest.filter { case (s, _) => shardFilter.forall(_.contains(s)) }
    if (entries.isEmpty) return None // nothing visible — let the scan run
    // set equality + length match = the manifest speaks for the files
    if (files.keySet != entries.keySet) return None
    if (!entries.forall { case (s, e) => files(s).length() == e.bytes })
      return None
    // doc-bound aggregates need the v2 fields on EVERY visible entry —
    // a legacy 3-field sidecar declines min/max but keeps count/sum
    val needBounds = funcs.exists(f => f == 'd' || f == 'D')
    if (needBounds && !entries.values.forall(e =>
        e.minDoc.isDefined && e.maxDoc.isDefined)) return None
    def row(shard: Option[Int], recs: Long, sumLen: Long,
        lo: Long, hi: Long, sLo: Int, sHi: Int): Array[Any] = {
      val aggVals: Seq[Any] = funcs.map {
        case 'c' => recs
        case 's' => sumLen
        case 'd' => lo
        case 'D' => hi
        case 'h' => sLo
        case 'H' => sHi
      }
      (shard.map(s => Seq(s: Any)).getOrElse(Seq.empty) ++ aggVals).toArray
    }
    val rows: Array[Array[Any]] =
      if (byShard)
        entries.toSeq.sortBy(_._1).map { case (s, e) =>
          row(Some(s), e.records, e.bytes - 12L * e.records,
            e.minDoc.getOrElse(0L), e.maxDoc.getOrElse(0L), s, s)
        }.toArray
      else {
        val n = entries.values.map(_.records).sum
        val b = entries.values.map(_.bytes).sum
        Array(row(None, n, b - 12L * n,
          entries.values.flatMap(_.minDoc)
            .foldLeft(Long.MaxValue)(math.min),
          entries.values.flatMap(_.maxDoc)
            .foldLeft(Long.MinValue)(math.max),
          entries.keys.min, entries.keys.max))
      }
    var schema = new StructType()
    if (byShard) schema = schema.add("shard", IntegerType, nullable = false)
    funcs.zipWithIndex.foreach { case (f, i) =>
      val t = f match {
        case 'h' | 'H' => IntegerType // shard bounds keep the column type
        case _         => LongType   // count/sum(int)/doc_id bounds
      }
      schema = schema.add(s"agg_$i", t, nullable = false)
    }
    val names = Map('c' -> "count", 's' -> "sum(length)",
      'd' -> "min(doc_id)", 'D' -> "max(doc_id)",
      'h' -> "min(shard)", 'H' -> "max(shard)")
    val desc = (if (byShard) "groupBy=shard " else "global ") +
      funcs.map(names).mkString(",")
    Some((schema, rows, desc))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("shard", _: Int)  => true
      case EqualTo("shard", _: Long) => true
      case In("shard", _)            => true
      case _                         => false
    }
    pushed = accepted
    val sets = accepted.map {
      case EqualTo("shard", v: Int)  => Set(v)
      case EqualTo("shard", v: Long) => Set(v.toInt)
      case In("shard", vs) => vs.collect {
        case v: Int => v
        case v: Long => v.toInt
      }.toSet
    }
    if (sets.nonEmpty) shardFilter = Some(sets.reduce(_ intersect _))
    rest // residuals stay; accepted ones are exact, but re-checking is free
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = pushedAgg match {
    case Some((schema, rows, desc)) =>
      new BlobShardAggScan(path, schema, rows, desc)
    case None =>
      new BlobShardScan(path, required, shardFilter, maxBytesPerBatch,
        pushedLimit)
  }
}

/** The scan a pushed-down aggregation builds: the final group rows were
  * computed at PLAN time from the `_manifest` sidecar (O(#shards)
  * driver IO), so the "scan" is one partition replaying them — no
  * shard file is ever opened. */
class BlobShardAggScan(path: String, schema: StructType,
    rows: Array[Array[Any]], desc: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shards path=$path PushedAggregation[$desc] (manifest-only)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(BlobShardAggPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] = {
        val rs = p.asInstanceOf[BlobShardAggPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = new GenericInternalRow(rs(i))
          override def close(): Unit = ()
        }
      }
    }
}

case class BlobShardAggPartition(rows: Array[Array[Any]])
    extends InputPartition

class BlobShardScan(path: String, required: StructType,
    shardFilter: Option[Set[Int]],
    maxBytesPerBatch: Option[Long] = None,
    limit: Option[Int] = None) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shards path=$path shards=${shardFilter.getOrElse("*")} " +
      s"columns=${required.fieldNames.mkString(",")}"

  /** RUNTIME (dynamic) shard pruning: the scan declares `shard` as its
    * filterable attribute; when this side joins a broadcastable dim on
    * shard with a selective predicate, Spark's dynamic-pruning rule
    * evaluates the dim FIRST and hands the surviving shard keys to
    * [[filter]] before `planInputPartitions` runs — the blob side then
    * opens only the matching files, the DSv2 analog of parquet's
    * dynamic partition pruning (q225 proves the static form). Compile-
    * time shard predicates (`shardFilter`) and runtime keys compose by
    * intersection. */
  @volatile private var runtimeShards: Option[Set[Int]] = None
  // Declared only when `shard` survives column pruning: Spark resolves
  // these refs against the scan OUTPUT, and an unresolvable ref is an
  // AnalysisException, not a skipped optimization.
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (required.fieldNames.contains("shard"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("shard"))
    else Array.empty
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("shard", vs) =>
      val ks = vs.collect { case v: Int => v; case v: Long => v.toInt }.toSet
      runtimeShards = Some(runtimeShards.fold(ks)(_ intersect ks))
    case EqualTo("shard", v: Int) =>
      runtimeShards = Some(runtimeShards.fold(Set(v))(_ intersect Set(v)))
    case _ => () // unsupported runtime filters are advisory — ignore
  }
  private def visible(shard: Int): Boolean =
    shardFilter.forall(_.contains(shard)) &&
      runtimeShards.forall(_.contains(shard))

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
      .sortBy(_.getName)
    files.flatMap { f =>
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt
      // partition pruning: filtered shards are never opened
      if (visible(shard))
        Some(BlobShardPartition(shard, f.getAbsolutePath, limit): InputPartition)
      else None
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BlobShardReaderFactory(required.fieldNames)

  /** STORAGE-PARTITIONED layout claim: every input partition is one
    * shard file, so the scan output is key-grouped on `shard` — the
    * DSv2 analog of a bucketed table. With
    * `spark.sql.sources.v2.bucketing.enabled=true` two graft-shards
    * tables written under the same layout contract join on
    * (shard, …) with ZERO shuffle exchanges (Spark's storage-
    * partitioned join, SPARK-37375): EnsureRequirements sees both
    * sides already clustered on the shard key and plans the join
    * directly over co-keyed partitions. Declared only while `shard`
    * survives column pruning — Spark resolves the identity transform
    * against the scan OUTPUT, and an unresolvable ref would downgrade
    * the claim anyway; a pruned scan reports Unknown instead. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val n = planInputPartitions().length
    if (required.fieldNames.contains("shard"))
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("shard")), n)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(n)
  }

  /** Source-reported statistics so Catalyst can COST joins against the
    * format instead of falling back to `defaultSizeInBytes` (which is
    * Long.MaxValue — it makes the side permanently unbroadcastable and
    * federated plans like q249 pick their join strategy by luck).
    * Row counts come from the `_manifest` sidecar the committed write
    * drops (O(#shards) driver IO at plan time, never a data walk); a
    * shard whose current file length disagrees with its manifest entry
    * (appended/truncated outside the writer) falls back to raw file
    * bytes and withdraws the exact row count. Column pruning is priced
    * in: with `media` pruned the scan materializes 24 bytes/row
    * (shard+doc_id+offset+length), not blob bytes. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val needMedia = required.fieldNames.contains("media")
    val manifest = BlobShardManifest.read(path)
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
      .filter { f =>
        val s = f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt
        shardFilter.forall(_.contains(s))
      }
    var rows = 0L; var bytes = 0L; var exact = true
    files.foreach { f =>
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt
      manifest.get(shard) match {
        case Some(e) if e.bytes == f.length() =>
          rows += e.records
          bytes += (if (needMedia) e.bytes else e.records * 24L)
        case _ => exact = false; bytes += f.length()
      }
    }
    val (szOut, rowsOut) = (math.max(bytes, 1L), rows)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(szOut)
      override def numRows(): java.util.OptionalLong =
        if (exact) java.util.OptionalLong.of(rowsOut)
        else java.util.OptionalLong.empty()
    }
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new BlobShardMicroBatchStream(path, required, shardFilter, maxBytesPerBatch)
}

case class BlobShardPartition(shard: Int, file: String,
    limit: Option[Int] = None) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  /** One shard file = one partition = one `shard` key value — the
    * ground truth behind [[BlobShardScan.outputPartitioning]]'s
    * KeyGroupedPartitioning claim. Spark groups co-keyed partitions
    * by THIS row at plan time (storage-partitioned join). */
  override def partitionKey(): InternalRow = InternalRow(shard)
}

class BlobShardReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BlobShardReader(p.asInstanceOf[BlobShardPartition], columns)
}

class BlobShardReader(p: BlobShardPartition, columns: Array[String])
    extends PartitionReader[InternalRow] {
  BlobShardIO.opened.incrementAndGet()
  private val needMedia = columns.contains("media")
  private var emitted = 0
  private val fileLen = new java.io.File(p.file).length()
  private val in = new DataInputStream(
    new BufferedInputStream(new FileInputStream(p.file), 1 << 16))
  private var pos = 0L
  private var row: InternalRow = _

  // P8 permissive decode: a TRUNCATED trailing record (header or blob
  // cut short) ends the scan after the last complete record instead of
  // failing the task — the same skip-don't-throw stance every decoder
  // in Multimodal takes. A negative length (corrupt header) also stops:
  // past it the framing is unrecoverable.
  override def next(): Boolean = try {
    // pushed LIMIT/TopN: the write contract sorts shards by doc_id, so
    // the file head IS the per-shard top-N — stop without reading on
    if (p.limit.exists(emitted >= _)) return false
    val docId = java.lang.Long.reverseBytes(in.readLong())
    val len = Integer.reverseBytes(in.readInt())
    if (len < 0) return false
    val blobOff = pos + 12L
    // a declared blob extending past EOF is a truncated record — stop
    // BEFORE emitting (FileInputStream.skip seeks past EOF silently, so
    // the pruned path cannot rely on skip() to detect this)
    if (blobOff + len > fileLen) return false
    val media: Array[Byte] =
      if (needMedia) {
        val b = new Array[Byte](len); in.readFully(b); b
      } else {
        // column pruning, physically: never materialize the blob.
        // skip() returns 0 at EOF — probe with read() so a truncated
        // blob terminates instead of spinning.
        var toSkip = len.toLong
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          if (s > 0) toSkip -= s
          else if (in.read() == -1) throw new EOFException()
          else toSkip -= 1
        }
        null
      }
    pos = blobOff + len
    val values = columns.map {
      case "shard"  => p.shard
      case "doc_id" => docId
      case "offset" => blobOff
      case "length" => len
      case "media"  => media
    }
    row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    emitted += 1
    BlobShardIO.records.incrementAndGet()
    true
  } catch { case _: EOFException => false }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** V2 WRITE path. [[BlobShardWrite]] implements
  * `RequiresDistributionAndOrdering`: it DECLARES that it needs rows
  * clustered by `shard` and sorted by (shard, doc_id), and the PLANNER
  * inserts the exchange and sort — the format states its layout
  * contract once, instead of every writing query hand-rolling
  * `repartition().sortWithinPartitions()`. Clustering guarantees all of
  * a shard lands in ONE task; the per-task writer switches output files
  * on shard boundaries (a task may own several whole shards). */
class BlobShardWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  // Shard files are a whole-corpus layout: per-shard offsets are running
  // sums in doc_id order, so appending rows can never preserve the
  // contract. Only truncate (= mode("overwrite")) builds; a silent
  // append would have destroyed existing data (the old factory cleared
  // the directory unconditionally at job start).
  private var truncated = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    truncated = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write = {
    if (!truncated) throw new UnsupportedOperationException(
      "graft-shards: append is not supported (per-shard offsets are a " +
        "whole-corpus layout) — use mode(\"overwrite\")")
    new BlobShardWrite(path, schema)
  }
}

class BlobShardWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
  override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.identity("shard")))
  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      Expressions.sort(Expressions.column("shard"), SortDirection.ASCENDING),
      Expressions.sort(Expressions.column("doc_id"), SortDirection.ASCENDING))
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new BlobShardBatchWrite(path, schema)
}

/** Per-task commit message: the staged tmp files this task wrote, with
  * record/byte counts for the `_manifest` sidecar. */
case class BlobShardCommitMsg(
    entries: Seq[(Int, String, BlobShardManifest.Entry)])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** `_manifest` sidecar: one line per shard `shard<TAB>records<TAB>fileBytes`,
  * written atomically (tmp + move) at job commit. Read by
  * [[BlobShardScan.estimateStatistics]]; a stale entry (file length
  * mismatch) is ignored per shard, so external appends degrade stats
  * instead of corrupting them. */
object BlobShardManifest {
  val Name = "_manifest"

  /** One shard's sidecar record. `minDoc`/`maxDoc` are the v2 fields
    * (the writer knows them for free — rows arrive (shard, doc_id)-
    * sorted under the layout contract); a v1 3-field line parses with
    * the bounds absent, so older sidecars keep answering count/sum
    * pushdowns and only decline min/max. */
  case class Entry(records: Long, bytes: Long,
      minDoc: Option[Long], maxDoc: Option[Long])

  def read(path: String): Map[Int, Entry] = {
    val f = new java.io.File(path, Name)
    if (!f.exists()) Map.empty
    else scala.io.Source.fromFile(f, "UTF-8").getLines().flatMap { ln =>
      try ln.split('\t') match {
        case Array(s, n, b) =>
          Some(s.toInt -> Entry(n.toLong, b.toLong, None, None))
        case Array(s, n, b, lo, hi) =>
          Some(s.toInt -> Entry(n.toLong, b.toLong,
            Some(lo.toLong), Some(hi.toLong)))
        case _ => None
      } catch { case _: NumberFormatException => None }
    }.toMap
  }

  def write(path: String, entries: Seq[(Int, Entry)]): Unit = {
    val tmp = new java.io.File(path, Name + ".tmp")
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try entries.sortBy(_._1).foreach { case (s, e) =>
      (e.minDoc, e.maxDoc) match {
        case (Some(lo), Some(hi)) =>
          w.println(s"$s\t${e.records}\t${e.bytes}\t$lo\t$hi")
        case _ => w.println(s"$s\t${e.records}\t${e.bytes}")
      }
    }
    finally w.close()
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(path, Name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Staged overwrite: tasks write `shard-N.bin.tmp-<taskId>`; the DRIVER
  * commit clears stale shard files and renames the staged ones, so a
  * failed or aborted job leaves the existing corpus untouched (the old
  * factory deleted everything at job start, before a single byte was
  * durable). `useCommitCoordinator` (the BatchWrite default) guarantees
  * one committing attempt per task, so tmp names keyed by taskId can't
  * collide with a committed winner. */
class BlobShardBatchWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write.{DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new java.io.File(path)
    if (!dir.exists()) dir.mkdirs()
    new BlobShardWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.flatMap {
      case m: BlobShardCommitMsg => m.entries
      case _ => Seq.empty
    }
    val dir = new java.io.File(path)
    // stale-file clear happens only now, with every task staged durably
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin")).foreach(_.delete())
    entries.foreach { case (shard, tmpName, _) =>
      java.nio.file.Files.move(new java.io.File(dir, tmpName).toPath,
        new java.io.File(dir, s"shard-$shard.bin").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // sweep tmp leftovers from retried attempts that never committed
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin\\.tmp-\\d+")).foreach(_.delete())
    BlobShardManifest.write(path,
      entries.map { case (s, _, e) => (s, e) })
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin\\.tmp-\\d+")).foreach(_.delete())
  }
}

class BlobShardWriterFactory(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new BlobShardDataWriter(path, schema, taskId)
}

class BlobShardDataWriter(path: String, schema: StructType, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val shardIdx = schema.fieldIndex("shard")
  private val docIdx = schema.fieldIndex("doc_id")
  private val mediaIdx = schema.fieldIndex("media")
  private var out: java.io.DataOutputStream = _
  private var cur = Int.MinValue
  private var recs = 0L
  private var bytes = 0L
  private var loDoc = Long.MaxValue
  private var hiDoc = Long.MinValue
  private val staged = scala.collection.mutable.ArrayBuffer
    .empty[(Int, String, BlobShardManifest.Entry)]

  private def closeCurrent(): Unit = if (out != null) {
    out.close(); out = null
    staged += ((cur, s"shard-$cur.bin.tmp-$taskId",
      BlobShardManifest.Entry(recs, bytes,
        if (recs > 0) Some(loDoc) else None,
        if (recs > 0) Some(hiDoc) else None)))
  }

  override def write(row: InternalRow): Unit = {
    val shard = row.getInt(shardIdx)
    if (shard != cur) {
      closeCurrent()
      out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$path/shard-$shard.bin.tmp-$taskId"), 1 << 16))
      cur = shard; recs = 0L; bytes = 0L
      loDoc = Long.MaxValue; hiDoc = Long.MinValue
    }
    val media = row.getBinary(mediaIdx)
    val doc = row.getLong(docIdx)
    out.writeLong(java.lang.Long.reverseBytes(doc))
    out.writeInt(Integer.reverseBytes(media.length))
    out.write(media)
    recs += 1; bytes += 12L + media.length
    if (doc < loDoc) loDoc = doc
    if (doc > hiDoc) hiDoc = doc
  }
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    closeCurrent()
    BlobShardCommitMsg(staged.toSeq)
  }
  override def abort(): Unit = {
    closeCurrent()
    staged.foreach { case (_, tmp, _) =>
      new java.io.File(path, tmp).delete()
    }
  }
  override def close(): Unit = if (out != null) out.close()
}

/** Convenience packer over the V2 write path: the format's
  * `RequiresDistributionAndOrdering` contract makes the planner insert
  * the shard-clustered exchange and (shard, doc_id) sort — callers just
  * hand over rows. */
object BlobShards {
  def pack(df: org.apache.spark.sql.DataFrame, outDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.select(col("shard").cast("int").as("shard"),
        col("doc_id").cast("long").as("doc_id"), col("media"))
      .write.format(classOf[BlobShardDataSource].getName)
      .option("path", outDir).mode("overwrite").save()
  }
}


/** Streaming offsets for the blob-shard source: byte position per shard
  * file, always clamped to a RECORD boundary by walking the frame
  * headers (an appender flushing through a buffered stream can expose a
  * mid-record file size; trusting raw sizes would make the next batch
  * resume inside a record and parse garbage). */
case class BlobShardOffset(pos: Map[Int, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    pos.toSeq.sortBy(_._1)
      .map { case (s, p) => s""""$s":$p""" }.mkString("{", ",", "}")
}

object BlobShardOffset {
  def parse(json: String): BlobShardOffset = BlobShardOffset(
    "\"(\\d+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

class BlobShardMicroBatchStream(path: String, required: StructType,
    shardFilter: Option[Set[Int]], maxBytesPerBatch: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def rawSizes(): Map[Int, Long] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
      .map(f => f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt -> f.length())
      .filter { case (s, _) => shardFilter.forall(_.contains(s)) }
      .toMap
  }

  // Last verified record boundary per shard: the clamp walk resumes here
  // instead of byte 0, so each record's header is inspected at most once
  // over the stream's lifetime. Committed offsets are boundaries by
  // induction (every emitted offset came out of this clamp), so a
  // restart from a checkpoint seeds a correct walk base implicitly.
  private val boundaryCache = scala.collection.mutable.Map.empty[Int, Long]

  /** Largest record boundary ≤ `observed` in `file`, walking frame
    * headers from `from` (a known boundary). A header or blob extending
    * past `observed` is a record still being flushed — excluded; the
    * next batch picks it up once the size covers it. */
  private def clampToBoundary(file: String, from: Long, observed: Long): Long = {
    var pos = from
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      val hdr = new Array[Byte](12)
      var done = false
      while (!done && pos + 12 <= observed) {
        raf.seek(pos)
        var got = 0
        while (got < 12) {
          val n = raf.read(hdr, got, 12 - got)
          if (n < 0) { done = true; got = 12 } else got += n
        }
        if (!done) {
          val len = (hdr(8) & 0xff) | ((hdr(9) & 0xff) << 8) |
            ((hdr(10) & 0xff) << 16) | ((hdr(11) & 0xff) << 24)
          if (len < 0 || pos + 12L + len > observed) done = true
          else pos += 12L + len
        }
      }
      pos
    } finally raf.close()
  }

  private def currentBoundaries(): Map[Int, Long] = rawSizes().map {
    case (shard, size) =>
      val cached = boundaryCache.getOrElse(shard, 0L)
      val b =
        if (size <= cached) cached // no growth (or truncation — hold position)
        else clampToBoundary(s"$path/shard-$shard.bin", cached, size)
      boundaryCache(shard) = b
      shard -> b
  }

  private var availableNowTarget: Option[BlobShardOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(BlobShardOffset(currentBoundaries()))

  override def initialOffset(): Offset = BlobShardOffset(Map.empty)
  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(BlobShardOffset(currentBoundaries()))
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): with
  // `maxBytesPerBatch` set, each micro-batch admits at most that many
  // record bytes (record-boundary-clamped; a single oversized record
  // still admits alone so the stream can't stall) — backpressure for
  // ingest bursts, the knob every production file stream needs. The
  // AvailableNow wrapper keeps triggering until the prepared target is
  // reached, so bounded runs still drain completely, batch by batch.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val full = availableNowTarget.map(_.pos).getOrElse(currentBoundaries())
    maxBytesPerBatch match {
      case None => BlobShardOffset(full)
      case Some(budget) =>
        val s = start.asInstanceOf[BlobShardOffset].pos
        var left = budget
        val out = full.toSeq.sortBy(_._1).map { case (shard, end) =>
          val st = s.getOrElse(shard, 0L)
          val tgt =
            if (left <= 0 || end <= st) st
            else {
              val lim = math.min(end, st + left)
              val b = clampToBoundary(s"$path/shard-$shard.bin", st, lim)
              val b2 = if (b > st) b
                else oneRecordEnd(s"$path/shard-$shard.bin", st, end)
              left -= (b2 - st)
              b2
            }
          shard -> tgt
        }.toMap
        BlobShardOffset(out)
    }
  }

  /** End position of the single record at `st` (≤ `end`), or `st` if
    * none is complete — the oversized-record escape hatch: a record
    * bigger than the whole batch budget must still ship, alone. */
  private def oneRecordEnd(file: String, st: Long, end: Long): Long = {
    if (st + 12 > end) return st
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      raf.seek(st)
      val hdr = new Array[Byte](12)
      var got = 0
      while (got < 12) {
        val n = raf.read(hdr, got, 12 - got)
        if (n < 0) return st
        got += n
      }
      val len = (hdr(8) & 0xff) | ((hdr(9) & 0xff) << 8) |
        ((hdr(10) & 0xff) << 16) | ((hdr(11) & 0xff) << 24)
      if (len < 0 || st + 12L + len > end) st else st + 12L + len
    } finally raf.close()
  }
  override def reportLatestOffset(): Offset = BlobShardOffset(currentBoundaries())
  override def deserializeOffset(json: String): Offset = BlobShardOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val s = start.asInstanceOf[BlobShardOffset].pos
    val e = end.asInstanceOf[BlobShardOffset].pos
    e.toSeq.sortBy(_._1).flatMap { case (shard, endPos) =>
      val startPos = s.getOrElse(shard, 0L)
      if (endPos > startPos)
        Some(BlobShardRangePartition(shard, s"$path/shard-$shard.bin",
          startPos, endPos): org.apache.spark.sql.connector.read.InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new BlobShardRangeReaderFactory(required.fieldNames)
}

case class BlobShardRangePartition(shard: Int, file: String,
    startPos: Long, endPos: Long)
    extends org.apache.spark.sql.connector.read.InputPartition

class BlobShardRangeReaderFactory(columns: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[BlobShardRangePartition]
    new BlobShardRangeReader(rp, columns)
  }
}

/** [[BlobShardReader]] restricted to the byte range [startPos, endPos) —
  * the incremental slice a micro-batch owns. */
class BlobShardRangeReader(p: BlobShardRangePartition, columns: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
  BlobShardIO.opened.incrementAndGet()
  private val needMedia = columns.contains("media")
  private val in = new DataInputStream(
    new BufferedInputStream(new FileInputStream(p.file), 1 << 16))
  private var pos = 0L
  private var depleted = false
  locally { // seek to the batch's start; skip() returns 0 at EOF forever,
    // so probe with read() — a file truncated/replaced below startPos
    // ends the partition instead of spinning this loop.
    var toSkip = p.startPos
    while (toSkip > 0 && !depleted) {
      val s = in.skip(toSkip)
      if (s > 0) toSkip -= s
      else if (in.read() == -1) depleted = true
      else toSkip -= 1
    }
    pos = p.startPos
  }
  private var row: InternalRow = _

  override def next(): Boolean = try {
    if (depleted || pos >= p.endPos) return false
    val docId = java.lang.Long.reverseBytes(in.readLong())
    val len = Integer.reverseBytes(in.readInt())
    if (len < 0) return false // corrupt header — stop permissively (P8)
    val blobOff = pos + 12L
    // record extending past the batch's end offset: not yet fully
    // visible at offset-capture time — next batch owns it
    if (blobOff + len > p.endPos) return false
    val media: Array[Byte] =
      if (needMedia) { val b = new Array[Byte](len); in.readFully(b); b }
      else {
        var t = len.toLong
        while (t > 0) {
          val s = in.skip(t)
          if (s > 0) t -= s
          else if (in.read() == -1) throw new EOFException()
          else t -= 1
        }
        null
      }
    pos = blobOff + len
    val values = columns.map {
      case "shard"  => p.shard
      case "doc_id" => docId
      case "offset" => blobOff
      case "length" => len
      case "media"  => media
    }
    row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  } catch { case _: EOFException => false }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
