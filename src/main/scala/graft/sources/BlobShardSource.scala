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

class BlobShardTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-shards source requires option(\"path\", dir)")
  override def name(): String = s"graft_shards($path)"
  override def schema(): StructType = BlobShardDataSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BlobShardScanBuilder(path)
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
  private val in = new DataInputStream(
    new BufferedInputStream(new FileInputStream(p.file), 1 << 16))
  private var pos = 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    val docId =
      try java.lang.Long.reverseBytes(in.readLong())
      catch { case _: EOFException => return false }
    val len = Integer.reverseBytes(in.readInt())
    val blobOff = pos + 12L
    val media: Array[Byte] =
      if (needMedia) {
        val b = new Array[Byte](len); in.readFully(b); b
      } else {
        // column pruning, physically: never materialize the blob
        var toSkip = len.toLong
        while (toSkip > 0) toSkip -= in.skip(toSkip)
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
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Shard-file WRITER: routes rows to `shard-N.bin` files in one pass —
  * executors each write the shards their partition holds, rows in
  * (shard, doc_id) order, little-endian record framing matching
  * [[BlobShardReader]]. Repartition by shard + sortWithinPartitions
  * first so every shard is written by exactly one task, sequentially —
  * the packing job a corpus delivery pipeline runs. */
object BlobShards {
  def pack(df: org.apache.spark.sql.DataFrame, outDir: String): Unit = {
    val dir = new java.io.File(outDir)
    if (dir.exists()) dir.listFiles().foreach(_.delete()) else dir.mkdirs()
    // hash-partition on shard: a partition may hold several shards (or
    // none); the writer opens a new file whenever the shard changes,
    // which the sort guarantees happens at most once per shard.
    df.select("shard", "doc_id", "media")
      .repartition(org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        var out: java.io.DataOutputStream = null
        var cur = Int.MinValue
        try {
          rows.foreach { r =>
            val shard = r.getAs[Number]("shard").intValue()
            val docId = r.getAs[Number]("doc_id").longValue()
            val media = r.getAs[Array[Byte]]("media")
            if (shard != cur) {
              if (out != null) out.close()
              out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(s"$outDir/shard-$shard.bin"), 1 << 16))
              cur = shard
            }
            out.writeLong(java.lang.Long.reverseBytes(docId))
            out.writeInt(Integer.reverseBytes(media.length))
            out.write(media)
          }
        } finally if (out != null) out.close()
      }
  }
}
