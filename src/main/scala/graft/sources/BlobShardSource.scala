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
    new BlobShardScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new BlobShardWriteBuilder(path, info.schema())
}

class BlobShardScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = BlobShardDataSource.fullSchema
  private var shardFilter: Option[Set[Int]] = None
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan = new BlobShardScan(path, required, shardFilter)
}

class BlobShardScan(path: String, required: StructType,
    shardFilter: Option[Set[Int]]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shards path=$path shards=${shardFilter.getOrElse("*")} " +
      s"columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
      .sortBy(_.getName)
    files.flatMap { f =>
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt
      // partition pruning: filtered shards are never opened
      if (shardFilter.forall(_.contains(shard)))
        Some(BlobShardPartition(shard, f.getAbsolutePath): InputPartition)
      else None
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BlobShardReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new BlobShardMicroBatchStream(path, required, shardFilter)
}

case class BlobShardPartition(shard: Int, file: String) extends InputPartition

class BlobShardReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BlobShardReader(p.asInstanceOf[BlobShardPartition], columns)
}

class BlobShardReader(p: BlobShardPartition, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private val needMedia = columns.contains("media")
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
  // truncate == overwrite-everything: the factory clears the directory
  // at job start either way (shard files are a whole-corpus layout).
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = this
  override def build(): org.apache.spark.sql.connector.write.Write =
    new BlobShardWrite(path, schema)
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

class BlobShardBatchWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write.{DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side job start: clear stale shard files so a re-pack with a
    // different shard set leaves no orphans
    val dir = new java.io.File(path)
    if (dir.exists())
      dir.listFiles().filter(_.getName.matches("shard-\\d+\\.bin"))
        .foreach(_.delete())
    else dir.mkdirs()
    new BlobShardWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class BlobShardWriterFactory(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new BlobShardDataWriter(path, schema)
}

class BlobShardDataWriter(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val shardIdx = schema.fieldIndex("shard")
  private val docIdx = schema.fieldIndex("doc_id")
  private val mediaIdx = schema.fieldIndex("media")
  private var out: java.io.DataOutputStream = _
  private var cur = Int.MinValue

  override def write(row: InternalRow): Unit = {
    val shard = row.getInt(shardIdx)
    if (shard != cur) {
      if (out != null) out.close()
      out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$path/shard-$shard.bin"), 1 << 16))
      cur = shard
    }
    val media = row.getBinary(mediaIdx)
    out.writeLong(java.lang.Long.reverseBytes(row.getLong(docIdx)))
    out.writeInt(Integer.reverseBytes(media.length))
    out.write(media)
  }
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (out != null) out.close()
    new org.apache.spark.sql.connector.write.WriterCommitMessage {}
  }
  override def abort(): Unit = if (out != null) out.close()
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
  * file. Writers append whole records, so any observed file SIZE is a
  * record boundary — the offset space is naturally consistent. */
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
    shardFilter: Option[Set[Int]])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def currentSizes(): Map[Int, Long] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
      .map(f => f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt -> f.length())
      .filter { case (s, _) => shardFilter.forall(_.contains(s)) }
      .toMap
  }

  private var availableNowTarget: Option[BlobShardOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(BlobShardOffset(currentSizes()))

  override def initialOffset(): Offset = BlobShardOffset(Map.empty)
  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(BlobShardOffset(currentSizes()))
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no rate
  // limiting — each batch admits everything up to the captured target.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    availableNowTarget.getOrElse(BlobShardOffset(currentSizes()))
  override def reportLatestOffset(): Offset = BlobShardOffset(currentSizes())
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
  private val needMedia = columns.contains("media")
  private val in = new DataInputStream(
    new BufferedInputStream(new FileInputStream(p.file), 1 << 16))
  private var pos = 0L
  locally { // seek to the batch's start
    var toSkip = p.startPos
    while (toSkip > 0) toSkip -= in.skip(toSkip)
    pos = p.startPos
  }
  private var row: InternalRow = _

  override def next(): Boolean = try {
    if (pos >= p.endPos) return false
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
