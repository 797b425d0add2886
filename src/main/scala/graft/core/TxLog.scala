package graft.core

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal lakehouse TRANSACTION LOG (the Delta/Iceberg core idea,
  * built from first principles on plain parquet + an append-only log of
  * versioned commits): every table mutation is a new numbered log entry
  * listing the data files it ADDS and REMOVES, committed atomically by
  * a rename that fails if the version already exists. That one
  * filesystem primitive buys, with no coordination service:
  *
  *   - ATOMIC multi-file commits: readers list the log, never the data
  *     directory, so a writer's staged files are invisible until its
  *     log entry lands (and a crashed writer leaves only unreferenced
  *     orphans — data-then-log write order);
  *   - SNAPSHOT ISOLATION + TIME TRAVEL: version N's live-file set is
  *     the log replayed through N — any historical version stays
  *     readable until vacuumed;
  *   - OPTIMISTIC CONCURRENCY: two writers racing to commit version N
  *     both stage data, but the rename is create-if-absent — exactly
  *     one wins, the loser re-reads and retries or aborts
  *     (TxLogSpec pins the race);
  *   - CHANGE DATA FEED: a version's delta IS its add/remove file
  *     lists — incremental consumers read only those files (q375).
  *
  * Log entries are newline-delimited `add\t<file>` / `remove\t<file>`
  * lines named `<version %08d>.txt` under `_log/`. At 100 TB the log is
  * file-grain metadata (KBs per commit for thousands of data files) and
  * replay cost is O(#commits) driver-side IO — checkpointing the
  * replayed set every N commits is the standard growth fix and changes
  * nothing structural. */
object TxLog {

  private def logDir(dir: String): File = new File(dir, "_log")

  private def versionFile(dir: String, v: Int): Path =
    logDir(dir).toPath.resolve(f"$v%08d.txt")

  /** Highest committed version, or -1 for an uninitialized table. */
  def currentVersion(dir: String): Int = {
    val files = Option(logDir(dir).listFiles()).getOrElse(Array.empty)
    val vs = files.flatMap(f => f.getName.stripSuffix(".txt").toIntOption
      .filter(_ => f.getName.endsWith(".txt")))
    if (vs.isEmpty) -1 else vs.max
  }

  /** (adds, removes) of one committed version. Field-split: an `add`
    * line may carry trailing file-statistics fields (see
    * [[appendWithStats]]) — the file name is always field 1. */
  def changes(dir: String, v: Int): (Seq[String], Seq[String]) = {
    val lines = new String(Files.readAllBytes(versionFile(dir, v)), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
    (lines.collect { case l if l.startsWith("add\t") => l.split('\t')(1) },
      lines.collect { case l if l.startsWith("remove\t") => l.split('\t')(1) })
  }

  /** Live data files at `asOf` (default: latest), by log replay. */
  def snapshot(dir: String, asOf: Option[Int] = None): Seq[String] = {
    val cur = currentVersion(dir)
    require(cur >= 0, s"$dir is not a TxLog table (no committed versions)")
    val v = asOf.getOrElse(cur)
    require(v >= 0 && v <= cur,
      s"version $v does not exist (table is at version $cur)")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (0 to v).foreach { i =>
      val (adds, removes) = changes(dir, i)
      removes.foreach(live -= _)
      adds.foreach(live += _)
    }
    live.toSeq
  }

  /** Commit `adds`/`removes` as version `expected + 1`. The rename is
    * create-if-absent: a concurrent commit of the same version makes
    * exactly one writer win; the loser gets ConcurrentModification. */
  def commit(dir: String, expected: Int,
      adds: Seq[String], removes: Seq[String]): Int = {
    logDir(dir).mkdirs()
    val v = expected + 1
    val body = (removes.map(f => s"remove\t$f") ++ adds.map(f => s"add\t$f"))
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(logDir(dir).toPath, s".commit-$v-", ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    try Files.move(tmp, versionFile(dir, v)) // NO replace → atomic claim
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"version $v was committed by another writer")
    }
    v
  }

  /** Stage `df` as uniquely-named parquet files in the table directory
    * (INVISIBLE until a commit references them); returns their names. */
  def stage(df: DataFrame, dir: String): Seq[String] = {
    new File(dir).mkdirs()
    val tmp = Files.createTempDirectory(Paths.get(dir), ".stage-")
    df.write.mode("overwrite").parquet(tmp.toString)
    val parts = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .sortBy(_.getName)
    val names = parts.zipWithIndex.map { case (f, i) =>
      val name = s"part-${java.util.UUID.randomUUID().toString.take(8)}-$i.parquet"
      Files.move(f.toPath, Paths.get(dir, name),
        StandardCopyOption.ATOMIC_MOVE)
      name
    }.toSeq
    // clear the staging litter (crc/_SUCCESS); data files already moved
    Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
      .foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(tmp)
    names
  }

  /** Stage + commit with FILE STATISTICS: each add line carries the
    * staged file's min/max of `statsCol`
    * (`add\t<file>\t<col>\t<min>\t<max>`) — the log-resident zone map
    * that lets [[pruneSnapshot]] skip files at PLAN time, the way
    * Delta/Iceberg store per-file column bounds. The bounds come from
    * a post-stage read here; a production writer takes them from the
    * parquet footer it just wrote, for free. Older/statless add lines
    * parse fine everywhere (the name is always field 1). */
  def appendWithStats(spark: SparkSession, df: DataFrame, dir: String,
      statsCol: String): Int = {
    import org.apache.spark.sql.functions.{col, max, min}
    val cur = currentVersion(dir)
    val adds = stage(df, dir).map { f =>
      val r = spark.read.parquet(s"$dir/$f")
        .agg(min(col(statsCol)), max(col(statsCol))).head()
      s"$f\t$statsCol\t${r.getLong(0)}\t${r.getLong(1)}"
    }
    val v = cur + 1
    logDir(dir).mkdirs()
    val body = adds.map(a => s"add\t$a").mkString("", "\n", "\n")
    val tmp = Files.createTempFile(logDir(dir).toPath, s".commit-$v-", ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    try { Files.move(tmp, versionFile(dir, v)); v }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"version $v was committed by another writer")
    }
  }

  /** Per-file [min, max] of `statsCol` from the log's add lines (files
    * committed without stats are absent — callers must keep them). */
  def fileStats(dir: String, statsCol: String,
      asOf: Option[Int] = None): Map[String, (Long, Long)] = {
    val v = asOf.getOrElse(currentVersion(dir))
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    (0 to v).foreach { i =>
      new String(Files.readAllBytes(versionFile(dir, i)), "UTF-8")
        .linesIterator.foreach { l =>
          if (l.startsWith("remove\t")) acc -= l.split('\t')(1)
          else if (l.startsWith("add\t")) l.split('\t') match {
            case Array(_, f, c, lo, hi) if c == statsCol =>
              acc(f) = (lo.toLong, hi.toLong)
            case _ => ()
          }
        }
    }
    acc.toMap
  }

  /** Live files whose `statsCol` range intersects [lo, hi] — plus any
    * file with no recorded stats (skipping must be conservative).
    * Returns (kept, total live) so callers can assert real pruning. */
  def pruneSnapshot(dir: String, statsCol: String, lo: Long, hi: Long,
      asOf: Option[Int] = None): (Seq[String], Int) = {
    val live = snapshot(dir, asOf)
    val stats = fileStats(dir, statsCol, asOf)
    val kept = live.filter { f =>
      stats.get(f).forall { case (fLo, fHi) => fLo <= hi && lo <= fHi }
    }
    (kept, live.size)
  }

  /** CREATE (version 0) — refuses on an existing table. */
  def create(df: DataFrame, dir: String): Int =
    commit(dir, -1, stage(df, dir), Seq.empty)

  /** APPEND: new files only, nothing removed. */
  def append(df: DataFrame, dir: String): Int =
    commit(dir, currentVersion(dir), stage(df, dir), Seq.empty)

  /** APPEND gated by a CHECK constraint (the Delta table-constraint
    * shape): if any incoming row violates `constraint`, NOTHING
    * commits — the violating batch is rejected atomically (staged
    * files stay unreferenced orphans, exactly the crash case vacuum
    * ignores and TxLogSpec proves invisible). The check runs on the
    * batch BEFORE staging is referenced, one aggregate pass. */
  def appendChecked(df: DataFrame, dir: String,
      constraint: org.apache.spark.sql.Column): Int = {
    val bad = df.filter(!constraint || constraint.isNull).limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(
      s"CHECK constraint violated by the incoming batch: $constraint")
    append(df, dir)
  }

  /** DELETE WHERE `pred`: copy-on-write — every live file holding a
    * matching row is rewritten without its matches; untouched files
    * stay referenced as-is (the Delta DELETE shape). */
  def deleteWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): Int = {
    val cur = currentVersion(dir)
    val live = snapshot(dir, Some(cur))
    val affected = live.filter { f =>
      spark.read.parquet(s"$dir/$f").filter(pred).limit(1).count() > 0
    }
    if (affected.isEmpty) return cur
    val keep = readFiles(spark, dir, affected,
      deletionVectors(dir, Some(cur))).filter(!pred)
    val adds = if (keep.isEmpty) Seq.empty[String] else stage(keep, dir)
    commit(dir, cur, adds, affected)
  }

  /** Read the table at `asOf` (default latest) — explicit file list, so
    * a stale/staged/removed file can never leak into the scan, with
    * that version's deletion vectors applied (merge-on-read). */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(dir))
    readFiles(spark, dir, snapshot(dir, Some(v)),
      deletionVectors(dir, Some(v)))
  }

  /** Accumulated DELETION VECTORS at `asOf`: file → deleted row
    * positions. `dv` marker lines union per file as the log replays;
    * removing a file clears its vectors (the rewrite materialized
    * them). Positions ride the log inline at fixture scale — the
    * production form is a roaring-bitmap sidecar FILE referenced by
    * the same line, with no protocol change. */
  def deletionVectors(dir: String,
      asOf: Option[Int] = None): Map[String, Set[Long]] = {
    val v = asOf.getOrElse(currentVersion(dir))
    val acc = scala.collection.mutable.Map.empty[String, Set[Long]]
    (0 to v).foreach { i =>
      new String(Files.readAllBytes(versionFile(dir, i)), "UTF-8")
        .linesIterator.foreach { l =>
          if (l.startsWith("remove\t")) acc -= l.substring(7)
          else if (l.startsWith("dv\t")) l.split('\t') match {
            case Array(_, f, ps) =>
              acc(f) = acc.getOrElse(f, Set.empty) ++
                ps.split(',').filter(_.nonEmpty).map(_.toLong)
            case _ => ()
          }
        }
    }
    acc.toMap
  }

  /** MERGE-ON-READ delete: instead of rewriting files (deleteWhere's
    * copy-on-write), commit the matching ROW POSITIONS as deletion
    * vectors — an O(matches) commit no matter how large the touched
    * files are, the Delta/Iceberg v2 "position delete" shape. Readers
    * anti-join `_metadata.row_index`; OPTIMIZE materializes (purges)
    * the vectors by rewriting. */
  def deleteWhereDV(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.col
    val cur = currentVersion(dir)
    val existing = deletionVectors(dir, Some(cur))
    val dvLines = snapshot(dir, Some(cur)).flatMap { f =>
      val already = existing.getOrElse(f, Set.empty)
      val hits = spark.read.parquet(s"$dir/$f").filter(pred)
        .select(col("_metadata.row_index")).collect()
        .map(_.getLong(0)).filterNot(already).sorted
      if (hits.isEmpty) None
      else Some(s"dv\t$f\t${hits.mkString(",")}")
    }
    if (dvLines.isEmpty) return cur
    val v = cur + 1
    logDir(dir).mkdirs()
    val tmp = Files.createTempFile(logDir(dir).toPath, s".commit-$v-", ".tmp")
    Files.write(tmp, dvLines.mkString("", "\n", "\n").getBytes("UTF-8"))
    try { Files.move(tmp, versionFile(dir, v)); v }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"version $v was committed by another writer")
    }
  }

  /** DV-aware scan of `files` as of the vectors in `dv`: rows whose
    * (file, position) is deleted never reach the caller. */
  private def readFiles(spark: SparkSession, dir: String,
      files: Seq[String], dv: Map[String, Set[Long]]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (files.isEmpty)
      throw new IllegalArgumentException("empty snapshot read")
    // mergeSchema: commits may EVOLVE the schema (add columns) — the
    // union schema is the table schema, old files read the new columns
    // as NULL (q380). Footer-merge cost is per-file metadata IO.
    val base = spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
    val relevant = dv.filter { case (f, ps) =>
      files.contains(f) && ps.nonEmpty }
    if (relevant.isEmpty) base
    else {
      val cols = base.columns.map(col)
      // key vectors by BASENAME: `_metadata.file_name` is the bare file
      // name, while a shallow clone's log references files by relative
      // PATH — both must hit the same anti-join key
      val dvRows = relevant.toSeq.flatMap { case (f, ps) =>
        ps.toSeq.map(p => (new File(f).getName, p)) }
      val dvDf = spark.createDataFrame(dvRows).toDF("__f", "__p")
      base
        .withColumn("__f", col("_metadata.file_name"))
        .withColumn("__p", col("_metadata.row_index"))
        .join(dvDf, Seq("__f", "__p"), "left_anti")
        .select(cols: _*)
    }
  }

  /** MERGE/UPSERT by key (insert-or-replace whole rows): copy-on-write
    * over exactly the files holding a matched key — rewritten without
    * their matches — plus the full source staged as new files, i.e.
    * new state = (old ∖ keys(source)) ∪ source. The per-file match
    * probe is a read here; at 100 TB the same decision comes from
    * file-level min/max or bloom sidecars (q274's zone maps) — the
    * LOG protocol is identical either way. */
  def upsert(spark: SparkSession, dir: String, source: DataFrame,
      keyCol: String): Int = {
    val cur = currentVersion(dir)
    val keys = source.select(keyCol).distinct().persist()
    try {
      val affected = snapshot(dir, Some(cur)).filter { f =>
        spark.read.parquet(s"$dir/$f")
          .join(keys, Seq(keyCol), "left_semi").limit(1).count() > 0
      }
      val survivors =
        if (affected.isEmpty) Seq.empty[String]
        else {
          val kept = readFiles(spark, dir, affected,
              deletionVectors(dir, Some(cur)))
            .join(keys, Seq(keyCol), "left_anti")
          if (kept.isEmpty) Seq.empty[String] else stage(kept, dir)
        }
      commit(dir, cur, survivors ++ stage(source, dir), affected)
    } finally { keys.unpersist(): Unit }
  }

  /** Idempotent append for exactly-once streaming sinks: the commit
    * carries a `txn\t<app>\t<id>` marker line; a replayed micro-batch
    * (same app + id already in the log) is SKIPPED — the
    * foreachBatch-replay contract q296 proves for JDBC, here as a log
    * protocol property. Returns the committed version, or -1 when the
    * batch was recognized as a replay. */
  def appendIdempotent(df: DataFrame, dir: String,
      app: String, txnId: Long): Int = {
    if (txnSeen(dir, app, txnId)) return -1
    val cur = currentVersion(dir)
    val adds = stage(df, dir)
    val v = cur + 1
    logDir(dir).mkdirs()
    val body = (adds.map(f => s"add\t$f") :+ s"txn\t$app\t$txnId")
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(logDir(dir).toPath, s".commit-$v-", ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    try { Files.move(tmp, versionFile(dir, v)); v }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"version $v was committed by another writer")
    }
  }

  /** Has `(app, txnId)` already committed? Scanned from the log's txn
    * marker lines (O(#commits) driver IO, like replay). */
  def txnSeen(dir: String, app: String, txnId: Long): Boolean = {
    val cur = currentVersion(dir)
    (0 to cur).exists { v =>
      new String(Files.readAllBytes(versionFile(dir, v)), "UTF-8")
        .linesIterator.contains(s"txn\t$app\t$txnId")
    }
  }

  /** OPTIMIZE: rewrite the current live set into `nFiles` compacted
    * files as a new version — bit-identical rows, new layout; older
    * versions keep reading the small files until vacuumed. */
  def optimize(spark: SparkSession, dir: String, nFiles: Int = 1): Int = {
    val cur = currentVersion(dir)
    val live = snapshot(dir, Some(cur))
    // DV-aware: compaction MATERIALIZES outstanding deletion vectors —
    // the rewritten files hold only live rows, and removing the old
    // files clears their vectors in the same commit
    val compacted = readFiles(spark, dir, live,
      deletionVectors(dir, Some(cur))).coalesce(nFiles)
    commit(dir, cur, stage(compacted, dir), live)
  }

  /** SHALLOW CLONE: a new table whose version 0 REFERENCES the source's
    * live files by relative path — zero bytes copied (the add-line
    * file field is joined under the clone's dir at read time, so
    * `../src/part-x.parquet` resolves naturally). The clone then
    * diverges independently: its deletes/appends/optimizes touch only
    * its own log and its own staged files; a copy-on-write rewrite
    * naturally "un-shares" whatever it touches. Caveat (same as
    * Delta's): vacuuming the SOURCE can break clones that still
    * reference its files — retention policy must span clones. */
  def shallowClone(srcDir: String, dstDir: String): Int = {
    val srcLive = snapshot(srcDir)
    val srcDvs = deletionVectors(srcDir)
    val rel = Paths.get(dstDir).toAbsolutePath
      .relativize(Paths.get(srcDir).toAbsolutePath)
    new File(dstDir).mkdirs()
    logDir(dstDir).mkdirs()
    def tr(f: String) = s"$rel${File.separator}$f"
    // outstanding source DVs carry over, keys translated — a clone of
    // a merge-on-read table must not resurrect deleted rows
    val lines = srcLive.map(f => s"add\t${tr(f)}") ++
      srcDvs.toSeq.filter { case (f, ps) =>
        srcLive.contains(f) && ps.nonEmpty }.sortBy(_._1)
        .map { case (f, ps) =>
          s"dv\t${tr(f)}\t${ps.toSeq.sorted.mkString(",")}" }
    val tmp = Files.createTempFile(logDir(dstDir).toPath, ".commit-0-", ".tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    try { Files.move(tmp, versionFile(dstDir, 0)); 0 }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"$dstDir already has a version 0")
    }
  }

  /** Drop data files no longer live at the CURRENT version and not
    * referenced by any version > `retainAfter` — the retention window
    * that keeps recent time travel working. Returns deleted names. */
  def vacuum(dir: String, retainAfter: Int): Seq[String] = {
    val cur = currentVersion(dir)
    val protectedFiles = (math.max(0, retainAfter) to cur)
      .flatMap(v => snapshot(dir, Some(v))).toSet
    val onDisk = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName)
    val victims = onDisk.filterNot(protectedFiles)
    victims.foreach(f => Files.deleteIfExists(Paths.get(dir, f)))
    victims.toSeq
  }

  /** Remove a table directory entirely (test/query setup hygiene). */
  def drop(dir: String): Unit = {
    def rec(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(): Unit
    }
    rec(new File(dir))
  }
}
