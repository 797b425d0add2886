package graft.queries

/** Process-wide persisted-artifact memo — the q258 "build once, serve
  * many" pattern (VERDICT r8 #8) generalized: deterministic per-corpus
  * build products (ANN indexes, kNN graphs, near-dup candidate pairs,
  * cluster labels) are built ONCE per (corpus dir, source table
  * fingerprint) and every consumer serves from the parquet artifact
  * scans. This is exactly the production shape — a nightly build job
  * plus artifact-reading services — and it is correctness-neutral:
  * parquet round-trips IEEE bits, so cached and inline results are
  * bit-identical and the oracle gate holds at any cache state. A
  * regenerated corpus invalidates through the (name, size, mtime)
  * file fingerprint. Serving from artifacts also truncates lineage for
  * iterative consumers (the round-4 plan-growth lesson) — no
  * localCheckpoint needed on the consumer side. */
object ArtifactMemo {

  // (corpus dir, artifact key, fingerprint) -> artifact directory
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), String]

  /** Order-stable digest of one source table's files under `dir`:
    * (name, size, NANOSECOND mtime, CRC32 of the file tail). The tail
    * CRC covers the parquet FOOTER — row counts, column stats, offsets
    * — so a corpus regenerated with identical file sizes inside the
    * filesystem's mtime resolution still invalidates (ADVICE r9: a
    * millis-only size+mtime fingerprint served stale artifacts to
    * hash-gated consumers in exactly that window). Driver IO is 4 KB
    * per file — file-grain metadata, same order as the listing walk. */
  def fingerprint(dir: String, table: String): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir, s"$table.parquet")
    def tailCrc(p: java.nio.file.Path, size: Long): Long = {
      val n = math.min(4096L, size).toInt
      if (n == 0) return 0L
      val ch = java.nio.channels.FileChannel.open(p)
      try {
        val buf = java.nio.ByteBuffer.allocate(n)
        ch.position(size - n)
        while (buf.hasRemaining && ch.read(buf) >= 0) ()
        val crc = new java.util.zip.CRC32
        crc.update(buf.array(), 0, buf.position())
        crc.getValue
      } finally ch.close()
    }
    val entries =
      if (!java.nio.file.Files.exists(root)) Seq(s"absent:$root")
      else {
        val s = java.nio.file.Files.walk(root)
        try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map { p =>
            val size = java.nio.file.Files.size(p)
            val nanos = java.nio.file.Files.getLastModifiedTime(p)
              .to(java.util.concurrent.TimeUnit.NANOSECONDS)
            s"${root.relativize(p)}:$size:$nanos:${tailCrc(p, size)}"
          }
          .toSeq.sorted
        finally s.close()
      }
    entries.mkString("|")
  }

  def deleteRecursively(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      finally s.close()
    } catch { case _: Throwable => () }

  // Stale artifact dirs (source fingerprint changed) are RETIRED, not
  // deleted inline: a DataFrame handed out earlier may still be
  // lazily scanning the old artifacts mid-job — deletion waits for
  // process exit.
  private val retired =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  sys.addShutdownHook {
    import scala.jdk.CollectionConverters._
    (cache.values ++ retired.asScala).foreach(deleteRecursively)
  }

  /** The artifact directory for (`corpusDir`, `key`), building it via
    * `build(tempDir)` on first use or after the source `table`'s
    * fingerprint changes. Builds are serialized under one lock:
    * TrieMap.getOrElseUpdate may evaluate a racing builder twice
    * (exactly one wins, the loser's work and temp dir leak), and
    * concurrent invocations of the same query (ConcurrencySpec) must
    * build once, not twice. */
  def dir(corpusDir: String, table: String, key: String)
      (build: String => Unit): String = synchronized {
    val fp = fingerprint(corpusDir, table)
    cache.keys.filter(k => k._1 == corpusDir && k._2 == key && k._3 != fp)
      .foreach(k => cache.remove(k).foreach(d => retired.add(d): Unit))
    cache.getOrElseUpdate((corpusDir, key, fp), {
      val t = java.nio.file.Files
        .createTempDirectory(s"graft_memo_${key}_").toString
      build(t)
      t
    })
  }
}
