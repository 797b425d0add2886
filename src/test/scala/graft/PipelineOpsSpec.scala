package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the round-5 additions q125–q131; exact-value
  * equivalence is covered by the DuckDB oracle gate (all seven are
  * hash-compared). These pin the semantic contracts the oracle can't
  * express: packing geometry, cap bounds, monotonicity, conservation. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q125_seq_pack: offsets are a gapless token-stream layout") {
    val rows = run("q125_seq_pack").collect()
    assert(rows.nonEmpty)
    // doc_id order = output order; each start_off is the previous end
    var expectedOff = 0L
    rows.foreach { r =>
      val (nTok, off) = (r.getAs[Long]("n_tok"), r.getAs[Long]("start_off"))
      assert(off == expectedOff, s"doc ${r.getAs[Long]("doc_id")}: gap")
      assert(r.getAs[Long]("seq_id") == off / 512)
      // spans ⇔ the doc's last token falls in a later window
      assert(r.getAs[Boolean]("spans") == ((off + nTok - 1) / 512 > off / 512))
      expectedOff = off + nTok
    }
  }

  test("q126_pmi_pairs: pairs are ordered, counts bounded by marginals") {
    val rows = run("q126_pmi_pairs").collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"))
      assert(!r.getAs[Double]("pmi").isNaN)
    }
    // co-occurrence can never exceed either marginal df
    val marg = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(array_distinct(split(trim(lower(text)), '\\\\s+'))) AS t")
      .groupBy("t").count().collect()
      .map(r => r.getAs[String]("t") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val bound = math.min(marg(r.getAs[String]("t1")), marg(r.getAs[String]("t2")))
      assert(r.getAs[Long]("n_ab") <= bound)
    }
  }

  test("q127_inverted_index: postings capped at 10, sorted, df consistent") {
    val rows = run("q127_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      assert(ids.length == math.min(r.getAs[Long]("df"), 10L))
      assert(ids == ids.sorted, "postings must list the 10 SMALLEST doc_ids")
    }
  }

  test("q128_growth_curve: cumulative uniques reconcile with exact distinct") {
    val rows = run("q128_growth_curve").collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum_uniques")).toSeq
    assert(cums == cums.sorted, "cumulative count must be non-decreasing")
    val totalUnique = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("md5(lower(regexp_replace(text, '\\\\s+', ' '))) AS fp")
      .distinct().count()
    assert(cums.last == totalUnique)
    assert(rows.map(_.getAs[Long]("new_uniques")).sum == totalUnique)
  }

  test("q129_oov_rate: oov counts bounded by token counts") {
    val rows = run("q129_oov_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_oov"))
      assert(oov >= 0 && oov <= n)
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q130_length_batches: batches hold ≤8 docs and are contiguous per bucket") {
    val rows = run("q130_length_batches").collect()
    assert(rows.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    rows.groupBy(r => (r.getAs[Int]("bucket"), r.getAs[Long]("batch_id")))
      .foreach { case (_, rs) => assert(rs.length <= 8) }
    rows.groupBy(_.getAs[Int]("bucket")).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("batch_id")).distinct.sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, "batch ids must be gapless")
    }
  }

  test("q132_filtered_ann: results come only from the filtered corpus") {
    val rows = run("q132_filtered_ann").collect()
    assert(rows.nonEmpty)
    val allowed = spark.read.parquet(s"$sf/documents.parquet")
      .filter("lang = 'en' AND n_chars >= 150")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    rows.foreach(r => assert(allowed(r.getAs[Long]("vec_id"))))
    // per query: ranks 1..k, similarity non-increasing
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q133_adaptive_filter: p25 threshold keeps at least 75% per language") {
    val rows = run("q133_adaptive_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept <= n)
      // the interpolated p25 sits at index (n−1)/4, so at most
      // floor((n−1)/4)+1 values can fall strictly below it
      assert(kept >= n - (n - 1) / 4 - 1, s"lang ${r.getAs[String]("lang")}: $kept/$n")
    }
  }

  test("q134_zipf_slope: slope is negative and finite") {
    val rows = run("q134_zipf_slope").collect()
    assert(rows.length == 1)
    val slope = rows.head.getAs[Double]("zipf_slope")
    assert(!slope.isNaN && slope < 0.0, s"slope=$slope")
  }

  test("q135_boilerplate: templated fraction bounded and df threshold honored") {
    val rows = run("q135_boilerplate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_grams"))
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("q136/q137 TPC-H shapes: bounded, revenue-ordered, non-empty") {
    val q3 = run("q136_tpch_q3").collect()
    assert(q3.nonEmpty && q3.length <= 10)
    val rev3 = q3.map(_.getAs[Double]("revenue")).toSeq
    assert(rev3.zip(rev3.tail).forall { case (a, b) => a >= b })
    val q5 = run("q137_tpch_q5").collect()
    assert(q5.nonEmpty)
    val rev5 = q5.map(_.getAs[Double]("revenue")).toSeq
    assert(rev5.zip(rev5.tail).forall { case (a, b) => a >= b })
  }

  test("q138_split_leakage: every reported pair crosses a split boundary") {
    val rows = run("q138_split_leakage").collect()
    rows.foreach(r =>
      assert(r.getAs[String]("split_a") != r.getAs[String]("split_b")))
  }

  test("q139_repeat_mixture: every copy carries the full source, max 4 epochs") {
    val rows = run("q139_repeat_mixture").collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 4, s"$src: more than 4 epochs")
      rs.foreach(r => assert(r.getAs[Long]("n_docs") == counts(src)))
      val copies = rs.map(_.getAs[Long]("copy")).sorted.toSeq
      assert(copies == (1L to copies.length).toSeq)
    }
    // the largest source is never repeated
    val largest = counts.maxBy(_._2)._1
    assert(bySource(largest).length == 1)
  }

  test("q140_hard_negatives: negatives always carry a different label") {
    val rows = run("q140_hard_negatives").collect()
    assert(rows.nonEmpty)
    val labels = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("vec_id")) != labels(r.getAs[Long]("q_id")))
      assert(r.getAs[Int]("rnk") >= 1 && r.getAs[Int]("rnk") <= 3)
    }
  }

  test("q141_stream_left_outer: watermark eviction emits the unmatched side") {
    val rows = run("q141_stream_left_outer").collect()
    assert(rows.nonEmpty)
    val (unmatched, matched) =
      rows.partition(_.getAs[Long]("purchase_id") == -1L)
    // if eviction never fired the unmatched side would be silently lost;
    // if the join degenerated everything would be unmatched
    assert(unmatched.nonEmpty, "no null-padded rows: outer state was dropped")
    assert(matched.nonEmpty, "no matched rows: join condition broken")
    rows.foreach(r => assert(r.getAs[Long]("user_id") >= 0, "sentinel leaked"))
  }

  test("q142_dup_triangles: per-node credits sum to 3 per triangle") {
    val rows = run("q142_dup_triangles").collect()
    // empty is legal on a tiny fixture (no 3-clique), but if present the
    // total credit must be a multiple of 3 and every count positive
    rows.foreach(r => assert(r.getAs[Long]("n_triangles") >= 1))
    assert(rows.map(_.getAs[Long]("n_triangles")).sum % 3 == 0)
  }

  test("q144_ivfpq_search: 5 ranked candidates per query, ADC non-decreasing") {
    val rows = run("q144_ivfpq_search").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val ds = sorted.map(_.getAs[Double]("adc")).toSeq
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, s"q$q not sorted")
      assert(ds.forall(_ >= 0.0))
      assert(!sorted.exists(_.getAs[Long]("vec_id") == q), "self-match leaked")
    }
  }

  test("q131_pagerank: integer ranks conserve mass and respect the floor") {
    val rows = run("q131_pagerank").collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val base = 150000000000L / n
    rows.foreach(r => assert(r.getAs[Long]("pr") >= base))
    // integer truncation only LOSES mass: total stays under the 1e12 scale
    assert(rows.map(_.getAs[Long]("pr")).sum <= 1000000000000L)
  }
}
