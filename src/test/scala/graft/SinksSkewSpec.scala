package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Sinks
import graft.ops.Skew

class SinksSkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("partitioned parquet write: readable, prunable") {
    val df = Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0))
      .toDF("id", "part", "v")
    val dir = Files.createTempDirectory("sink").toString
    Sinks.parquet(df, dir, partitionBy = Seq("part"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val pruned = back.filter(col("part") === "a")
    assert(pruned.count() == 2)
    // partition filter must reach the scan, not a post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(part"), plan)
  }

  test("sizedParquet + compact: fragmented table rewritten to N even files") {
    def parquetFiles(dir: String): Array[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val df = spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
    val frag = Files.createTempDirectory("frag").toString + "/t"
    // simulate the fragmented state: one file per upstream task
    df.repartition(32).write.parquet(frag)
    assert(parquetFiles(frag).length == 32)
    val out = Files.createTempDirectory("compact").toString + "/t"
    Sinks.compact(spark, frag, out, nFiles = 4)
    val files = parquetFiles(out)
    assert(files.length == 4)
    // round-robin repartition → even sizes (within 25%)
    val sizes = files.map(_.length())
    assert(sizes.max < sizes.min * 1.25, sizes.mkString(","))
    assert(spark.read.parquet(out).count() == 10000)
    // data survives byte-for-byte (same multiset of rows)
    assert(spark.read.parquet(out).except(df).isEmpty &&
      df.except(spark.read.parquet(out)).isEmpty)
  }

  test("clusteredParquet: files own disjoint sorted key ranges (skipping-ready)") {
    // Row-group min/max skipping happens inside the reader; what the
    // writer controls — and this asserts from the parquet footers — is
    // the layout that makes skipping effective: every file (and every
    // row group) owns a key range disjoint from all others, so a point
    // predicate overlaps exactly one.
    import scala.jdk.CollectionConverters._
    val df = spark.range(20000).select(col("id"), (col("id") * 3).as("v"))
    val dir = Files.createTempDirectory("clust").toString + "/t"
    Sinks.clusteredParquet(df, dir, nFiles = 8, cols = Seq("id"))
    val conf = new org.apache.hadoop.conf.Configuration()
    val ranges = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val stats = r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == "id").map(_.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
        } finally r.close()
      }.sortBy(_._1)
    assert(ranges.length == 8)
    // pairwise disjoint and totally ordered: max of file i < min of file i+1
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, ranges.mkString(","))
      case _ =>
    }
    // and the full keyspace is covered
    assert(ranges.head._1 == 0L && ranges.last._2 == 19999L)
  }

  test("foreachBatch sink: stream lands each micro-batch as a batch write") {
    val srcDir = Files.createTempDirectory("fb_src")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "tag")
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val outDir = Files.createTempDirectory("fb_out").toString
    val q = Sinks.foreachBatchParquet(
      spark.readStream.schema(schema).parquet(srcDir.toString), outDir)
    q.awaitTermination()
    val back = spark.read.parquet(s"$outDir/batch_0")
    assert(back.count() == 3)
    assert(back.columns.sorted.toSeq == Seq("id", "tag"))
  }

  test("bucketed table write: no exchange when aggregating on bucket key") {
    val df = Seq((1L, 5.0), (1L, 6.0), (2L, 7.0)).toDF("k", "v")
    Sinks.bucketed(df, "bucketed_t", Seq("k"), nBuckets = 4)
    val agg = spark.table("bucketed_t").groupBy("k").agg(sum($"v"))
    assert(agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == Map(1L -> 11.0, 2L -> 7.0))
    // bucketing satisfies the hash-partitioning requirement: no Exchange
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    spark.sql("DROP TABLE bucketed_t")
  }

  test("bucketed-bucketed join: co-located, no exchange on either side") {
    // The fact⋈fact shape that motivates bucketing at 100 TB: both sides
    // pre-bucketed on the join key with the SAME bucket count join
    // without shuffling either input (sort-merge over co-located files).
    val fact1 = (1 to 200).map(i => (i.toLong % 40, i.toDouble)).toDF("k", "a")
    val fact2 = (1 to 300).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "b")
    Sinks.bucketed(fact1, "bkt_f1", Seq("k"), nBuckets = 4)
    Sinks.bucketed(fact2, "bkt_f2", Seq("k"), nBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_f1").join(spark.table("bkt_f2"), "k")
        .groupBy("k").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no exchange:\n$plan")
      // same result as the un-bucketed join
      val expect = fact1.join(fact2, "k").groupBy("k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE bkt_f1")
    spark.sql("DROP TABLE bkt_f2")
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").count().orderBy("k").collect().toSeq
    val salted = Skew.saltedCount(df, Seq("k"), salts = 8)
      .orderBy("k").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getLong(1)))
      == plain.map(r => (r.getString(0), r.getLong(1))))
  }

  test("salted join physically spreads one hot key across partitions") {
    // PlanSpec pins the SHUFFLE_HASH shape; this pins the POINT of it:
    // the pair space of a single hot key actually lands on many
    // reducers. AQE off (it would coalesce these tiny partitions back
    // together — at real scale the buckets are too big to coalesce) and
    // 16 shuffle partitions, on a Tuned clone so the shared test
    // session's conf is untouched.
    val ns = graft.core.Tuned.session(spark,
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.enabled" -> "false")
    val left = ns.createDataFrame((1 to 400).map(i => ("hot", i)))
      .toDF("k", "a")
    val right = ns.createDataFrame((1 to 50).map(i => ("hot", i)))
      .toDF("k", "b")
    val joined = Skew.saltedJoin(left, right, "k", salts = 8)
    val sizes = joined.rdd
      .mapPartitions(it => Iterator(it.size)).collect().filter(_ > 0)
    assert(sizes.sum == 400 * 50, "pair multiplicity broken by salting")
    assert(sizes.length >= 4,
      s"hot key's pairs landed on only ${sizes.length} reducers: " +
        sizes.mkString(","))
    assert(sizes.max <= sizes.sum / 3,
      s"one reducer still owns ${sizes.max} of ${sizes.sum} pairs")
  }

  test("salted join equals plain join") {
    val big = (1 to 500).map(i => (i % 5, i)).toDF("k", "payload")
    val small = Seq((0, "z"), (1, "o"), (2, "t"), (3, "th"), (4, "f"))
      .toDF("k", "name")
    val plain = big.join(small, "k").orderBy("payload")
      .select("k", "payload", "name").collect().toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 4).orderBy("payload")
      .select("k", "payload", "name").collect().toSeq
    assert(salted == plain)
  }
}
