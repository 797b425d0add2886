package graft

import org.scalatest.funsuite.AnyFunSuite

/** The physical half of q292 the oracle gate cannot see: compaction must
  * actually REDUCE the data-file count. Before: 40 hash-keyed partition
  * dirs (the small-file state); after: one bin dir per plan bin, each
  * holding exactly ONE data file (the repartition-on-bin guarantees a
  * bin's rows land in a single task). */
class CompactionSpec extends AnyFunSuite {
  import TestSpark.spark

  private def dataFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(new java.io.File(root))
  }

  test("q292 rewrite collapses 40 small files into one file per bin") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q292_compaction_execute")(spark, dir)
    val bins = out.collect().map(_.getInt(0)).toSeq
    val (small, compact) = graft.queries.ExtQueries.compactionDirs(dir)
    val before = dataFiles(small)
    val after = dataFiles(compact)
    assert(before.size >= 40,
      s"expected >= 40 small data files, found ${before.size}")
    assert(after.size == bins.size,
      s"expected exactly one data file per bin (${bins.size}), " +
        s"found ${after.size}")
    // every bin dir exists and holds exactly one data file
    bins.foreach { b =>
      val files = dataFiles(s"$compact/bin=$b")
      assert(files.size == 1, s"bin=$b has ${files.size} data files")
    }
    // and the rewrite preserved the corpus
    assert(spark.read.parquet(compact).count() ==
      spark.read.parquet(small).count(), "rewrite lost or duplicated rows")
  }
}
