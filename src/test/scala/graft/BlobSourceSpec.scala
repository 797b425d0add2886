package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{BlobShardDataSource, BlobShards}

/** The custom DataSource V2 behaviors the oracle gate (q247) cannot see:
  * shard-predicate pushdown must prune INPUT PARTITIONS (files never
  * opened), and column pruning must drop `media` from the scan output.
  * Plus byte-level round-trip fidelity of the writer/reader framing. */
class BlobSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("blobspec_").toString
    val df = (0L until 40L).map { id =>
      (id, (id % 4).toInt, Array.fill((id + 1).toInt)((id % 7).toByte))
    }.toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    out
  }

  private def read() = spark.read
    .format(classOf[BlobShardDataSource].getName)
    .option("path", dir).load()

  test("one input partition per shard; shard filter prunes files") {
    assert(read().rdd.getNumPartitions == 4, "expected 4 shard partitions")
    assert(read().filter(col("shard") === 2).rdd.getNumPartitions == 1,
      "shard = 2 must prune to one partition")
    assert(read().filter(col("shard").isin(1, 3)).rdd.getNumPartitions == 2,
      "shard IN (1,3) must prune to two partitions")
  }

  test("aggregate pushdown answers count/sum from the manifest with " +
      "ZERO shard-file opens; a stale manifest withdraws the pushdown") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_a_").toString
    val df = (0L until 40L).map { id =>
      (id, (id % 4).toInt, Array.fill((id % 5).toInt + 1)(id.toByte))
    }.toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    def t = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load()
    graft.sources.BlobShardIO.opened.set(0)
    val grouped = t.groupBy("shard")
      .agg(expr("count(*)").as("n"), sum("length").as("b")).orderBy("shard")
    val rows = grouped.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum == 40L, s"pushed counts wrong: ${rows.toSeq}")
    val expectBytes = (0L until 40L).groupBy(id => (id % 4).toInt)
      .view.mapValues(_.map(id => (id % 5) + 1).sum).toMap
    rows.foreach { case (s, _, b) =>
      assert(b == expectBytes(s), s"pushed sum(length) wrong for shard $s") }
    assert(graft.sources.BlobShardIO.opened.get() == 0,
      "a pushed aggregation must not open any shard file")
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation") && plan.contains("manifest-only"),
      s"plan must show the pushed aggregation:\n$plan")
    // global (no grouping) count is also manifest-only
    graft.sources.BlobShardIO.opened.set(0)
    assert(t.count() == 40L)
    assert(graft.sources.BlobShardIO.opened.get() == 0,
      "count() must be manifest-only")
    // grow a shard file behind the manifest's back: pushdown must
    // WITHDRAW (stale sidecar) and the real scan must answer correctly
    val f = new java.io.FileOutputStream(s"$out/shard-2.bin", true)
    try { // one full extra record: doc_id 99, 3 blob bytes
      val bb = java.nio.ByteBuffer.allocate(15)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putLong(99L); bb.putInt(3); bb.put(Array[Byte](1, 2, 3))
      f.write(bb.array())
    } finally f.close()
    graft.sources.BlobShardIO.opened.set(0)
    assert(t.count() == 41L, "stale manifest must fall back to a real scan")
    assert(graft.sources.BlobShardIO.opened.get() == 4,
      "fallback must actually scan the files")
  }

  test("min/max(doc_id) push down from the v2 manifest bounds with zero " +
      "opens; a legacy 3-field sidecar declines bounds but keeps count") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_mm_").toString
    val df = (0L until 40L).map { id =>
      (id * 7, (id % 4).toInt, Array.fill(2)(id.toByte)) // non-dense ids
    }.toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    def t = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load()
    graft.sources.BlobShardIO.opened.set(0)
    val rows = t.groupBy("shard")
      .agg(expr("count(*)").as("n"), min("doc_id").as("lo"),
        max("doc_id").as("hi"))
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (0L until 40L).map(i => (i * 7, (i % 4).toInt))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    rows.foreach { case (sh, n, lo, hi) =>
      assert(n == want(sh).size && lo == want(sh).min && hi == want(sh).max,
        s"wrong pushed bounds for shard $sh: ($n, $lo, $hi)")
    }
    assert(graft.sources.BlobShardIO.opened.get() == 0,
      "manifest-backed min/max must not open shard files")
    // rewrite the sidecar in the legacy 3-field form: bounds decline
    // (real scan), count-only still pushes with zero opens
    val legacy = graft.sources.BlobShardManifest.read(out).toSeq
      .map { case (s, e) =>
        (s, graft.sources.BlobShardManifest.Entry(e.records, e.bytes,
          None, None))
      }
    graft.sources.BlobShardManifest.write(out, legacy)
    graft.sources.BlobShardIO.opened.set(0)
    assert(t.agg(min("doc_id")).head().getLong(0) == 0L)
    assert(graft.sources.BlobShardIO.opened.get() == 4,
      "legacy sidecar must fall back to a real scan for bounds")
    graft.sources.BlobShardIO.opened.set(0)
    assert(t.count() == 40L)
    assert(graft.sources.BlobShardIO.opened.get() == 0,
      "legacy sidecar must still answer count manifest-only")
  }

  test("runtime shard filtering: a broadcast dim's surviving keys prune " +
      "the blob files at execution time") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_rf_").toString
    val df = (0L until 40L).map { id =>
      (id, (id % 4).toInt, Array.fill(4)(id.toByte))
    }.toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    val blobs = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load().select("shard", "doc_id")
    // parquet-backed dim with a selective predicate → DPP subquery
    val dimDir = java.nio.file.Files.createTempDirectory("blobspec_rfd_").toString
    Seq((2, "keep"), (7, "drop")).toDF("shard_key", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    graft.sources.BlobShardIO.opened.set(0)
    val j = blobs.join(broadcast(dim), col("shard") === col("shard_key"))
    assert(j.count() == 10L, "join result wrong")
    val opened = graft.sources.BlobShardIO.opened.get()
    assert(opened == 1L,
      s"runtime filter must prune to the single matching shard file, opened=$opened")
  }

  test("LIMIT and TopN(doc_id ASC) push down: readers stop at the file " +
      "head instead of scanning every record; other orderings refuse") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_l_").toString
    val df = (0L until 100L).map { id =>
      (id, (id % 4).toInt, Array.fill(3)(id.toByte))
    }.toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    def t = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load()
    // bare LIMIT: each of the 4 shards reads ≤ 5 records
    graft.sources.BlobShardIO.records.set(0)
    assert(t.limit(5).collect().length == 5)
    val readLimit = graft.sources.BlobShardIO.records.get()
    assert(readLimit <= 20,
      s"limit must stop at per-shard heads, read $readLimit records")
    // TopN on the write contract's order: correct AND early-stopping
    graft.sources.BlobShardIO.records.set(0)
    val top = t.orderBy("doc_id").limit(5).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(top == (0L until 5L), s"topN wrong: $top")
    val readTop = graft.sources.BlobShardIO.records.get()
    assert(readTop <= 20,
      s"topN(doc_id) must stop at per-shard heads, read $readTop records")
    // an ordering the layout does NOT provide: refused, full scan, right
    graft.sources.BlobShardIO.records.set(0)
    val desc = t.orderBy(col("doc_id").desc).limit(3).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(desc == Seq(99L, 98L, 97L), s"desc topN wrong: $desc")
    assert(graft.sources.BlobShardIO.records.get() == 100,
      "a refused ordering must fall back to the full scan")
  }

  test("column pruning drops media from the scan output") {
    val p = read().select("doc_id", "length")
      .queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("media"),
      s"media not pruned from scan: $scanLine")
  }

  test("round trip: ids, lengths, offsets, and bytes survive pack+scan") {
    val rows = read().orderBy("doc_id").collect()
    assert(rows.length == 40)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val media = r.getAs[Array[Byte]]("media")
      assert(media.length == (id + 1).toInt, s"length wrong for doc $id")
      assert(media.forall(_ == (id % 7).toByte), s"bytes wrong for doc $id")
      assert(r.getAs[Int]("length") == media.length)
    }
    // offsets: within a shard, sorted by doc_id, each record starts where
    // the previous ended (+12-byte header).
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      sorted.foldLeft(0L) { (pos, r) =>
        assert(r.getAs[Long]("offset") == pos + 12,
          s"offset mismatch at doc ${r.getAs[Long]("doc_id")}")
        pos + 12 + r.getAs[Int]("length")
      }
    }
  }

  test("V2 write: planner honors the clustered+sorted layout contract " +
      "from adversarial input; overwrite clears stale shards") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_w_").toString
    // 13 partitions, rows deliberately scrambled: RequiresDistribution-
    // AndOrdering must re-cluster by shard and sort by (shard, doc_id)
    // or the per-shard offsets below come out wrong.
    val scrambled = (0L until 60L).map { id =>
      (id, (id % 5).toInt, Array.fill(3)(id.toByte))
    }.toDF("doc_id", "shard", "media")
      .orderBy(md5(col("doc_id").cast("string"))).repartition(13)
    BlobShards.pack(scrambled, out)
    val rows = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load().collect()
    assert(rows.length == 60)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      val byOffset = rs.sortBy(_.getAs[Long]("offset")).map(_.getAs[Long]("doc_id"))
      assert(byOffset.sameElements(byOffset.sorted),
        "shard file not written in doc_id order")
    }
    // re-pack with fewer shards: the old shard-4 file must not survive
    val fewer = (0L until 10L).map(id => (id, 0, Array.fill(2)(id.toByte)))
      .toDF("doc_id", "shard", "media")
    BlobShards.pack(fewer, out)
    val shards = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load().select("shard").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(shards == Set(0), s"stale shard files survived overwrite: $shards")
  }

  test("micro-batch read: records appended between batches arrive " +
      "exactly once (byte-position offsets)") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_s_").toString
    val first = (0L until 6L).map(id => (id, (id % 2).toInt,
      Array.fill(4)(id.toByte))).toDF("doc_id", "shard", "media")
    BlobShards.pack(first, out)
    val mem = "blobstream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load()
      .select("shard", "doc_id", "length")
      .writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(mem).count() == 6, "initial batch incomplete")
      // append two records to shard 0 with the writer's framing —
      // the running stream must pick up EXACTLY the new bytes
      val f = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$out/shard-0.bin", true)))
      for (id <- Seq(100L, 101L)) {
        f.writeLong(java.lang.Long.reverseBytes(id))
        f.writeInt(Integer.reverseBytes(3))
        f.write(Array.fill(3)(9.toByte))
      }
      f.close()
      q.processAllAvailable()
      val rows = spark.table(mem).collect()
      assert(rows.length == 8, s"appended records not picked up: ${rows.length}")
      val newIds = rows.map(_.getAs[Long]("doc_id")).filter(_ >= 100L)
      assert(newIds.sorted.sameElements(Array(100L, 101L)),
        s"append read wrong: ${newIds.toSeq}")
      assert(rows.count(_.getAs[Long]("doc_id") < 100L) == 6,
        "old records re-emitted (offset regression)")
    } finally q.stop()
  }

  test("truncated trailing record is skipped, not a task failure (P8)") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_t_").toString
    val df = (0L until 5L).map(id => (id, 0, Array.fill(8)(id.toByte)))
      .toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    // truncate mid-blob of the last record: 5 records × (12+8) bytes;
    // cut 5 bytes off the tail
    val f = new java.io.RandomAccessFile(s"$out/shard-0.bin", "rw")
    f.setLength(f.length() - 5)
    f.close()
    val rows = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load().collect()
    assert(rows.length == 4, s"expected 4 complete records, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.sameElements(0L until 4L))
    // same contract on the media-pruned (skip) path
    val pruned = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load().select("doc_id").collect()
    assert(pruned.length == 4, "pruned-column scan diverged on truncation")
  }

  test("filters on non-shard columns are NOT pushed (stay as Spark filters)") {
    val df = read().filter(col("doc_id") > 10)
    assert(df.count() == 29, "row filter must still apply")
    assert(df.rdd.getNumPartitions == 4, "doc_id filter must not prune shards")
  }

  test("append mode is rejected — it cannot preserve the offset layout") {
    val df = (0L until 3L).map(id => (id, 0, Array.fill(2)(id.toByte)))
      .toDF("doc_id", "shard", "media")
    val before = read().count()
    val e = intercept[Exception] {
      df.write.format(classOf[BlobShardDataSource].getName)
        .option("path", dir).mode("append").save()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.isInstanceOf[UnsupportedOperationException]),
      s"expected UnsupportedOperationException, got $e")
    assert(read().count() == before, "rejected append must not touch data")
  }

  test("a FAILED overwrite job leaves the existing shard files intact " +
      "(staged commit)") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_f_").toString
    val good = (0L until 8L).map(id => (id, (id % 2).toInt,
      Array.fill(4)(id.toByte))).toDF("doc_id", "shard", "media")
    BlobShards.pack(good, out)
    val bomb = udf((id: Long) =>
      if (id == 5L) throw new RuntimeException("boom") else Array.fill(4)(id.toByte))
    val bad = (0L until 8L).map(id => (id, (id % 2).toInt))
      .toDF("doc_id", "shard").withColumn("media", bomb(col("doc_id")))
    intercept[Exception] { BlobShards.pack(bad, out) }
    val rows = spark.read.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load().collect()
    assert(rows.length == 8, s"failed job destroyed data: ${rows.length} rows left")
    assert(!new java.io.File(out).listFiles().exists(_.getName.contains(".tmp-")),
      "staged tmp files must not leak")
  }

  test("scan reports statistics: exact rows from the manifest, " +
      "column-pruning-aware sizeInBytes") {
    // full schema: sizeInBytes = total file bytes (headers + blobs)
    val full = read().queryExecution.optimizedPlan.stats
    val fileBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.matches("shard-\\d+\\.bin")).map(_.length()).sum
    assert(full.rowCount.contains(BigInt(40)), s"rowCount: ${full.rowCount}")
    assert(full.sizeInBytes == BigInt(fileBytes),
      s"sizeInBytes ${full.sizeInBytes} != file bytes $fileBytes")
    // media pruned: 24 bytes/row, not blob bytes
    val pruned = read().select("doc_id", "length")
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats
      }.get
    assert(pruned.rowCount.contains(BigInt(40)))
    assert(pruned.sizeInBytes == BigInt(40L * 24),
      s"pruned sizeInBytes ${pruned.sizeInBytes} != ${40L * 24}")
    // shard pruning shrinks the stats with the file set
    val one = read().filter(col("shard") === 2)
      .queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats
      }.get
    assert(one.rowCount.contains(BigInt(10)), s"shard-pruned rows: ${one.rowCount}")
  }

  test("statistics drive the join strategy: the small blob side broadcasts") {
    val big = spark.range(0, 200000)
      .withColumn("pad", lpad(col("id").cast("string"), 64, "x"))
      .withColumnRenamed("id", "doc_id")
    val joined = big.join(read().select("doc_id", "length"), "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join by source statistics:\n$plan")
    val bcastIdx = plan.indexOf("BroadcastExchange")
    assert(bcastIdx >= 0 && plan.indexOf("graft-shards", bcastIdx) > bcastIdx,
      s"blob side must be the broadcast side:\n$plan")
  }

  test("storage-partitioned join: two same-layout shard tables join " +
      "on (shard, doc_id) with zero shuffle exchanges (SMJ over the " +
      "sources' KeyGroupedPartitioning claim)") {
    val dir2 = java.nio.file.Files.createTempDirectory("blobspec_spj_").toString
    val df2 = (0L until 40L).map { id =>
      (id, (id % 4).toInt, Array.fill(((id % 3) + 2).toInt)(7.toByte))
    }.toDF("doc_id", "shard", "media")
    BlobShards.pack(df2, dir2)
    val ts = graft.core.Tuned.session(spark,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    def rd(p: String) = ts.read.format(classOf[BlobShardDataSource].getName)
      .option("path", p).load()
    val j = rd(dir).select(col("shard"), col("doc_id"),
        col("length").as("len_a"))
      .join(rd(dir2).select(col("shard"), col("doc_id"),
        col("length").as("len_b")), Seq("shard", "doc_id"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over co-keyed partitions:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"storage-partitioned join must not shuffle either side:\n$plan")
    assert(j.count() == 40, "all 40 docs must pair across the two layouts")
    // the claim is withdrawn when `shard` is pruned from the output —
    // the identity transform could not resolve against the scan schema
    val pruned = rd(dir).select("doc_id", "length")
    assert(pruned.queryExecution.executedPlan.toString.nonEmpty &&
      pruned.count() == 40) // Unknown partitioning still scans fine
  }

  test("maxBytesPerBatch rate-limits admission: a burst drains in " +
      "multiple record-aligned micro-batches; an oversized record " +
      "still ships alone") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_r_").toString
    // 6 records × (12 + 4) = 16 bytes each, one shard
    val df = (0L until 6L).map(id => (id, 0, Array.fill(4)(id.toByte)))
      .toDF("doc_id", "shard", "media")
    BlobShards.pack(df, out)
    val mem = "blobrate_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format(classOf[BlobShardDataSource].getName)
      .option("path", out).option("maxBytesPerBatch", "35")
      .load().select("doc_id", "length")
      .writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(mem).count() == 6, "rate limit lost records")
      val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
      assert(sizes.forall(_ <= 2), s"batch exceeded the 35-byte budget: $sizes")
      assert(sizes.length >= 3, s"burst not split across batches: $sizes")
    } finally q.stop()
    // budget below one record: each batch still ships exactly one
    val mem2 = "blobrate1_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q2 = spark.readStream.format(classOf[BlobShardDataSource].getName)
      .option("path", out).option("maxBytesPerBatch", "10")
      .load().select("doc_id")
      .writeStream.format("memory").queryName(mem2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(mem2).count() == 6, "oversized-record path stalled")
      val sizes = q2.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
      assert(sizes.forall(_ == 1), s"oversized records must ship alone: $sizes")
    } finally q2.stop()
  }

  test("micro-batch offsets clamp to record boundaries: a mid-record " +
      "flush is never split across batches") {
    val out = java.nio.file.Files.createTempDirectory("blobspec_m_").toString
    val first = (0L until 4L).map(id => (id, 0,
      Array.fill(4)(id.toByte))).toDF("doc_id", "shard", "media")
    BlobShards.pack(first, out)
    val mem = "blobclamp_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format(classOf[BlobShardDataSource].getName)
      .option("path", out).load()
      .select("shard", "doc_id", "length")
      .writeStream.format("memory").queryName(mem)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(mem).count() == 4, "initial batch incomplete")
      // append one record but FLUSH ONLY A PREFIX (header + 2 of 6 blob
      // bytes) — the raw file size is now mid-record, exactly what a
      // concurrent reader can observe under a buffered writer
      val f = new java.io.FileOutputStream(s"$out/shard-0.bin", true)
      val d = new java.io.DataOutputStream(f)
      d.writeLong(java.lang.Long.reverseBytes(100L))
      d.writeInt(Integer.reverseBytes(6))
      d.write(Array.fill(2)(7.toByte))
      d.flush(); f.getFD.sync()
      q.processAllAvailable() // must admit NOTHING (no complete record)
      assert(spark.table(mem).count() == 4,
        "mid-record bytes were admitted as a batch")
      // complete the record + one more
      d.write(Array.fill(4)(7.toByte))
      d.writeLong(java.lang.Long.reverseBytes(101L))
      d.writeInt(Integer.reverseBytes(3))
      d.write(Array.fill(3)(8.toByte))
      d.close()
      q.processAllAvailable()
      val got = spark.table(mem).collect().map(_.getAs[Long]("doc_id")).sorted
      assert(got.sameElements(Array(0L, 1L, 2L, 3L, 100L, 101L)),
        s"boundary-clamped resume wrong: ${got.toSeq}")
      val lens = spark.table(mem).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("length")).toMap
      assert(lens(100L) == 6 && lens(101L) == 3,
        s"framing corrupted across the clamped boundary: $lens")
    } finally q.stop()
  }
}
