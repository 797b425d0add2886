package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Set-oriented sinks (SURVEY §2.1 S3/S4/S7). The reference loads with one
  * INSERT statement + network round-trip + autocommit per row
  * (`airflow/dags/driver_etl.py:87-96`) — which forced its 1000-row Laps
  * cap — and resets via hand-run `DELETE FROM` scripts
  * (`DDL Final.sql:338-352`). Here every sink is a distributed write;
  * overwrite mode subsumes the reset.
  */
object Sinks {

  /** Parquet, optionally hive-partitioned. Partition columns become
    * directories → partition pruning at read time (the scan shows
    * `PartitionFilters`), the first-order scan reducer at 100 TB. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed managed table: pre-shuffles rows into `nBuckets` by
    * `bucketCols`, so joins/aggregations on those keys skip the exchange
    * entirely — the co-located-join strategy for repeated fact⋈fact work. */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit =
    bucketedSorted(df, table, bucketCols, bucketCols, nBuckets)

  /** Bucketed CTAS with a sort key that extends the bucket key — the
    * layout a merge-style operator (as-of, SMJ) wants: cluster on the
    * join key, order within each bucket by (key, time). Spark elides
    * the per-partition sort only when each bucket holds ONE file, so
    * callers that want the full elision should repartition on the
    * bucket key before writing. */
  def bucketedSorted(df: DataFrame, table: String, bucketCols: Seq[String],
      sortCols: Seq[String], nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // A managed table's DIRECTORY outlives the in-memory catalog: a
    // fresh JVM sees no table but an occupied location, and CTAS
    // refuses (LOCATION_ALREADY_EXISTS). Drop whatever the catalog
    // knows, then clear any stale directory a previous JVM left.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  /** Plain managed CTAS (no bucketing) — a catalog entry is what
    * `ANALYZE TABLE` hangs statistics on (q367's CBO tables). Same
    * stale-location hygiene as [[bucketedSorted]]. */
  def managed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** JDBC append with batched, parameter-bound statements — the
    * set-oriented replacement for the reference's per-row MsSqlOperator
    * loop. Exercised end-to-end against embedded Derby (on Spark's
    * classpath) in JdbcSinkSpec: F1 Driver rows round-trip
    * write→read-back, and append appends. */
  def jdbc(df: DataFrame, url: String, table: String,
      user: String, password: String, batchSize: Int = 10000): Unit =
    jdbcFull(df, url, table, user, password, batchSize = batchSize)

  /** The full dialect/option surface of the JDBC writer (the reference's
    * S3 sink is literally MS SQL Server — `driver_etl.py:87-96`), each
    * knob a production necessity at scale:
    *  - `columnTypes`: explicit DDL type mapping for table creation
    *    ("name VARCHAR(40), code CHAR(3)") — dialect defaults map Spark
    *    StringType to unbounded text types (Derby/MSSQL: CLOB/NVARCHAR
    *    (max)), which many dialects won't index;
    *  - `truncate` overwrite: TRUNCATE + reload instead of DROP +
    *    CREATE, preserving grants/indexes/constraints — the production
    *    form of the reference's hand-run DELETE reset (S7);
    *  - `numPartitions`: caps write parallelism = concurrent
    *    connections — a 1000-task stage must NOT open 1000 sessions
    *    against one database (Spark coalesces to this bound, no
    *    shuffle);
    *  - `isolationLevel`: per-batch transaction isolation (NONE for
    *    bulk backfills on an idle table, READ_COMMITTED default).
    * Exercised against embedded Derby in JdbcSinkSpec, including the
    * negative case (VARCHAR width enforcement from `columnTypes`). */
  def jdbcFull(df: DataFrame, url: String, table: String,
      user: String, password: String,
      mode: SaveMode = SaveMode.Append,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      numPartitions: Option[Int] = None,
      columnTypes: Option[String] = None,
      truncate: Boolean = false): Unit = {
    var w = df.write.mode(mode).format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", isolationLevel)
      .option("truncate", truncate.toString)
    numPartitions.foreach(n => w = w.option("numPartitions", n.toString))
    columnTypes.foreach(t => w = w.option("createTableColumnTypes", t))
    w.save()
  }

  /** File-count-controlled write — the small-files defense. A 1000-task
    * stage writing per-task files turns a 100 TB table into millions of
    * KB-sized parquet files whose footer reads then dominate every scan.
    * `repartition(nFiles)` bounds the file count; `maxRecordsPerFile`
    * caps the other direction (no single task writing a 10 GB file).
    * The round-robin repartition also rebalances skewed upstream
    * partitions, so file sizes come out even. */
  def sizedParquet(df: DataFrame, path: String, nFiles: Int,
      maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(nFiles).write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(path)

  /** Compaction: rewrite a fragmented parquet directory into `nFiles`
    * evenly-sized files at `outPath`. Reads lazily + writes to a NEW
    * directory (Spark cannot safely overwrite an input path it is
    * reading); the caller swaps directories after the write commits —
    * the same commit-then-swap discipline every table format uses. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, nFiles: Int): Unit = {
    require(inPath != outPath, "compaction must write to a new directory")
    sizedParquet(spark.read.parquet(inPath), outPath, nFiles)
  }

  /** Clustered write: range-partition on `cols` so each output file owns
    * a disjoint key range, and sort within files so parquet row-group
    * min/max stats are tight. A point or range predicate on `cols` then
    * prunes to the few files/row-groups whose range overlaps — the scan
    * reads O(selectivity), not O(table). This is the data-layout half of
    * scan pruning (the query half — predicate pushdown — is free); at
    * 100 TB it is the difference between touching 2 files and 20,000. */
  def clusteredParquet(df: DataFrame, path: String, nFiles: Int,
      cols: Seq[String]): Unit = {
    val keys = cols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Streaming micro-batch sink (SURVEY §2.9): `foreachBatch` bridges a
    * stream to any batch writer — the Structured Streaming form of the
    * reference's daily-refresh load. Each micro-batch arrives as a plain
    * DataFrame for a set-oriented write; the checkpoint plus per-batch
    * target path give exactly-once delivery across restarts. */
  def foreachBatchParquet(stream: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch_$batchId")
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
