package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Invariant specs for the round-1 late additions (q56–q58); exact-value
  * equivalence is covered by the DuckDB oracle gate. */
class NewOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("AnnIndex.optimize: rebuild bounded to oversized cells, " +
      "generation 2 preserves root membership; balanced index no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("annopt_").toString
    // 10 vectors in 2 cells: cell 0 holds 8 (oversized at 1.5× mean),
    // cell 1 holds 2
    // cell-0 members fan out in angle (so the 2 sub-seeds genuinely
    // partition them); cell-1 members are a distinct constant direction
    val emb = (0L until 10L).map(i =>
      (i, if (i < 8) Array(1f, i.toFloat, 0f, 0f)
          else Array(0f, 0f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val membership = (0L until 10L).map(i => (i, if (i < 8) 0L else 1L))
      .toDF("vec_id", "cent_id")
    val (rebuilt, reassigned) = graft.ops.AnnIndex.optimize(emb, membership, out, imbalance = 1.5)
    assert(rebuilt == 1L && reassigned == 8L,
      s"exactly the oversized cell rebuilds, got ($rebuilt, $reassigned)")
    val v2 = spark.read.parquet(s"$out/membership_v2")
    assert(v2.count() == 10L, "no member lost or duplicated")
    // root membership is PRESERVED through the split — the serve-path
    // invariance hinges on exactly this
    assert(v2.filter(col("root_id") === 0L).count() == 8L &&
      v2.filter(col("root_id") === 1L).count() == 2L)
    assert(spark.read.parquet(s"$out/subcents").count() == 2L,
      "2 deterministic sub-centroids per split cell")
    assert(v2.filter(col("root_id") === 0L).select("sub_id")
      .distinct().count() == 2L, "the split cell's members spread " +
        "across both sub-cells or collapse to one — but through sub ids")
    // balanced index (high threshold): nothing rebuilds, gen2 == gen1
    val out2 = java.nio.file.Files.createTempDirectory("annopt2_").toString
    val (r2, n2) = graft.ops.AnnIndex.optimize(emb, membership, out2, imbalance = 10.0)
    assert(r2 == 0L && n2 == 0L)
    val same = spark.read.parquet(s"$out2/membership_v2")
      .select(col("vec_id"), col("root_id").as("cent_id"))
    assert(same.exceptAll(membership).isEmpty &&
      membership.exceptAll(same).isEmpty)
  }

  test("OPTIMIZE INDEX SQL verb runs the maintenance operator against " +
      "persisted artifacts and reports the bounded-rebuild counters") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("annsql_").toString
    val embP = java.nio.file.Files.createTempDirectory("annsqle_").toString
    (0L until 10L).map(i =>
      (i, if (i < 8) Array(1f, i.toFloat, 0f, 0f)
          else Array(0f, 0f, 1f, 1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$embP/emb")
    (0L until 10L).map(i => (i, if (i < 8) 0L else 1L))
      .toDF("vec_id", "cent_id")
      .write.mode("overwrite").parquet(s"$idx/membership")
    val r = spark.sql(
      s"OPTIMIZE INDEX '$idx' USING '$embP/emb' IMBALANCE 1.5").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 8L,
      s"expected (1 cell, 8 vectors), got $r")
    assert(spark.read.parquet(s"$idx/membership_v2").count() == 10L)
    assert(spark.read.parquet(s"$idx/subcents").count() == 2L)
  }

  test("q56_kmeans_ivf: learned clusters partition all vectors") {
    val rows = run("q56_kmeans_ivf").collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("bucket_size")).sum == total)
    // learned centroids differ from the raw seed vectors: checksum is a
    // mean, so it must be finite and nonzero for nonempty clusters
    assert(rows.forall(r => !r.getAs[Double]("cent_checksum").isNaN))
  }

  test("q57_array_funcs: per-doc token stats are internally consistent") {
    val rows = run("q57_array_funcs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_distinct") >= 1)
      assert(r.getAs[Int]("n_long") <= r.getAs[Int]("n_distinct") * 1000) // sanity
      assert(r.getAs[Int]("longest") >= 1)
    }
  }

  test("q60_approx_distinct: HLL estimate within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = run("q60_approx_distinct").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("approx_users")).toMap
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n <= 0.05,
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("q78_cms_heavy_hitters: estimate never undercounts, top hitter sane") {
    val rows = run("q78_cms_heavy_hitters").collect()
    assert(rows.length == 20)
    // the CMS one-sided error guarantee: collisions only inflate
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n_true"),
        s"${r.getAs[String]("w")}: est < true")
    }
    // result is sorted by estimate desc
    val ests = rows.map(_.getAs[Long]("est")).toSeq
    assert(ests == ests.sorted.reverse)
  }

  test("q66_approx_percentile: estimates bracketed by exact neighbors") {
    import org.apache.spark.sql.functions._
    val approx = run("q66_approx_percentile").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50_approx"), r.getAs[Double]("p90_approx"))).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.48, 0.52, 0.88, 0.92))").as("ps"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ps) =>
      val (p50, p90) = approx(k)
      assert(p50 >= ps(0) && p50 <= ps(1), s"$k p50=$p50 not in [${ps(0)}, ${ps(1)}]")
      assert(p90 >= ps(2) && p90 <= ps(3), s"$k p90=$p90 not in [${ps(2)}, ${ps(3)}]")
    }
  }

  test("q58_moving_avg: frame of one equals the row's own price") {
    val rows = run("q58_moving_avg").collect()
    assert(rows.nonEmpty)
    // exactly one window-first row (null lag) per customer partition
    rows.groupBy(_.getAs[Long]("o_custkey")).values.foreach { part =>
      assert(part.count(r => r.isNullAt(r.fieldIndex("gap_days"))) == 1)
    }
  }

  test("q82_window_frames: rank distributions and RANGE sum are coherent") {
    val rows = run("q82_window_frames").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Int]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pct_rank")
      val cd = r.getAs[Double]("cume")
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      // the RANGE frame always includes the current row
      assert(r.getAs[Double]("nearby_sum") >= r.getAs[Double]("o_totalprice") - 1e-6)
    }
    // quartiles within a partition are monotone in the rank order
    rows.groupBy(_.getAs[String]("o_orderpriority")).values.foreach { part =>
      val qs = part.sortBy(r =>
        (r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
        .map(_.getAs[Int]("quartile")).toSeq
      assert(qs == qs.sorted)
    }
  }

  test("q83_full_outer: every day from either side appears exactly once") {
    import org.apache.spark.sql.functions._
    val rows = run("q83_full_outer").collect()
    val days = rows.map(_.getAs[java.sql.Date]("d").toString)
    assert(days.distinct.length == days.length)
    val orderDays = spark.read.parquet(s"$sf/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(orderDays.subsetOf(days.toSet))
    // outer rows: a day with zero orders must have events, and vice versa
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") + r.getAs[Long]("n_events") > 0)
    }
  }

  test("q85_token_shards: shards are contiguous doc ranges within budget") {
    val rows = run("q85_token_shards").collect()
    assert(rows.nonEmpty)
    val byShard = rows.sortBy(_.getAs[Long]("shard"))
    // shards are consecutive integers starting at 0
    assert(byShard.map(_.getAs[Long]("shard")).toSeq ==
      (0L until byShard.length).toSeq)
    // doc ranges are contiguous and non-overlapping in shard order
    byShard.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // every shard but the last crosses the budget only by its final doc:
    // tokens_before_last_doc < budget boundary of the next shard
    assert(byShard.map(_.getAs[Long]("n_docs")).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("q86_price_bands: bands partition all orders, deciles roughly even") {
    val rows = run("q86_price_bands").collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val b = r.getAs[Long]("band_id"); b >= 0 && b <= 9
    })
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    // decile bands: no band holds more than a quarter of the data
    assert(rows.forall(_.getAs[Long]("n_orders") <= total / 4 + 1))
  }

  test("q84_salted_histogram equals the plain groupBy count") {
    import org.apache.spark.sql.functions._
    val salted = run("q84_salted_histogram").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val plain = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(salted == plain)
  }

  test("q109_bm25: scores positive, ranked descending, and tf-monotone") {
    val rows = run("q109_bm25").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-_)), "not ranked by score desc")
  }

  test("q110_ann_recall: one row per query, recall = hits/5 within [0,1]") {
    val rows = run("q110_ann_recall").collect()
    assert(rows.length == 8) // 8 query vectors, left join keeps them all
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      val rec = r.getAs[Double]("recall_at_5")
      assert(hits >= 0 && hits <= 5)
      assert(rec == hits / 5.0)
    }
  }

  test("q111_histogram: bins partition all rows, edges tile [lo, hi]") {
    val rows = run("q111_histogram").collect()
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 19)
      assert(r.getAs[Double]("edge_lo") < r.getAs[Double]("edge_hi"))
    }
  }

  test("q112_token_entropy: 0 <= H <= ln(n_tok) for every doc") {
    val rows = run("q112_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val n = r.getAs[Long]("n_tok")
      assert(h >= 0.0 && h <= math.log(n.toDouble) + 1e-6,
        s"entropy $h outside [0, ln($n)]")
    }
  }

  test("q113_token_ids: id sequence length equals the doc's token count") {
    val rows = run("q113_token_ids").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("ids").split(" ").length == r.getAs[Long]("n_tok"))
    }
  }

  test("q114_epoch_shuffle: a permutation into dense 64-doc shards") {
    val rows = run("q114_epoch_shuffle").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == total, "not a permutation: row count differs")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == total)
    // every shard except the last is exactly full, positions are dense
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    val last = byShard.keys.max
    byShard.foreach { case (s, rs) =>
      val sz = if (s == last) (total - 1) % 64 + 1 else 64
      assert(rs.length == sz, s"shard $s has ${rs.length} docs, expected $sz")
      assert(rs.map(_.getAs[Long]("pos_in_shard")).sorted.sameElements(0L until sz))
    }
  }

  test("q116_bloom_newdocs: no false negatives, fp rate within bound") {
    import org.apache.spark.sql.functions._
    // q116's relational bloom keys on the raw content digest
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
    val existing = docs.filter(col("doc_id") % 2 === 0)
    // Bloom guarantee on the NATIVE expression path q116 uses: every
    // inserted member answers true when probed through
    // graft_might_contain against the graft_bloom_agg-built filter.
    val n = math.max(existing.count(), 1L)
    val bits = math.max(
      math.ceil(-n * math.log(0.03) / (math.log(2) * math.log(2))).toLong, 64L)
    val bfBytes = existing
      .select(call_function("graft_bloom_agg",
        xxhash64(col("fp")), lit(n), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val nMiss = existing
      .filter(!call_function("graft_might_contain", lit(bfBytes), xxhash64(col("fp"))))
      .count()
    assert(nMiss == 0L, s"$nMiss false negatives from the native bloom probe")
    // aggregate view: flagged docs >= true cross-half duplicates per source,
    // and never exceeds the doc count
    val rows = run("q116_bloom_newdocs").collect()
    val trueDups = docs.filter(col("doc_id") % 2 === 1).as("i")
      .join(existing.select(col("fp")).distinct().as("e"), "fp")
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val s0 = r.getAs[String]("source")
      val flagged = r.getAs[Long]("n_maybe_dup")
      assert(flagged >= trueDups.getOrElse(s0, 0L), s"false negative in $s0")
      assert(flagged <= r.getAs[Long]("n_docs"))
    }
  }

  test("q117_quality_logit: probabilities in (0,1), keep consistent with threshold") {
    val rows = run("q117_quality_logit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("quality_p")
      assert(p > 0.0 && p < 1.0)
      assert(r.getAs[Boolean]("keep") == (p >= 0.5))
    }
  }

  test("q118_corpus_card: token shares sum to 1, doc counts cover the corpus") {
    val rows = run("q118_corpus_card").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    rows.foreach(r => assert(r.getAs[Double]("avg_chars") > 0))
  }

  test("alternatingStar labels an 80-hop chain inside its O(log n) round budget") {
    // the load-bearing difference between the two CC algorithms: label
    // propagation needs diameter rounds (79 here — beyond its cap, it
    // warns and returns unconverged labels), large-star/small-star
    // collapses the same chain in <= ~2·log2(n)+2 rounds
    import spark.implicits._
    val chain = (0L until 79L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = graft.ops.ConnectedComponents.alternatingStar(chain, maxRounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 80 && labels.values.forall(_ == 0L),
      s"chain not collapsed to component min: ${labels.toSeq.sortBy(_._1).take(10)}")
  }

  test("q166_binary_quant: Hamming distances bounded by the signature " +
      "width; rerank returns exactly top-5 per query") {
    val rows = run("q166_binary_quant").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ham = r.getAs[Int]("ham")
      assert(ham >= 0 && ham <= 64, s"hamming $ham outside [0,64]")
      val cs = r.getAs[Double]("cos_sim")
      assert(cs >= -1.000001 && cs <= 1.000001)
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} results")
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to 5))
    }
  }

  test("q167_embed_whiten: whitened norms are positive, finite, and " +
      "average ~1 (unit-variance components)") {
    val rows = run("q167_embed_whiten").collect()
    val norms = rows.map(_.getAs[Double]("wnorm"))
    assert(norms.forall(n => n > 0 && !n.isNaN && !n.isInfinite))
    // mean of wnorm² over the corpus is exactly 1 by construction
    // (each component standardized over the same population); the
    // norm itself concentrates near 1.
    val meanSq = norms.map(n => n * n).sum / norms.length
    assert(math.abs(meanSq - 1.0) < 0.01, s"mean wnorm² = $meanSq")
  }

  test("q238_negative_sampling: CDF intervals tile [0, W) — every draw " +
      "matches exactly one token") {
    // The inverse-CDF lookup is only correct if the PrefixSum-derived
    // [lo, hi) intervals cover the weight space with no gap or overlap:
    // the binned range join must then return EXACTLY one row per probe
    // (4 per document). A gap loses draws; an overlap duplicates them.
    val rows = run("q238_negative_sampling").collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == 4 * nDocs,
      s"expected ${4 * nDocs} draws, got ${rows.length}")
    val perProbe = rows.groupBy(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("j"))).values.map(_.length)
    assert(perProbe.forall(_ == 1), "a draw matched more than one interval")
    // draws follow the unigram distribution's support: every sampled
    // token must actually occur in the corpus weight table
    assert(rows.forall(_.getAs[String]("neg_token").nonEmpty))
  }

  test("q168_kcenter_coreset: selections are distinct and the " +
      "min-distance radius is non-increasing in step") {
    val rows = run("q168_kcenter_coreset").collect().sortBy(_.getAs[Int]("step"))
    assert(rows.length == 4)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 4, s"duplicate centers: ${ids.toSeq}")
    // greedy farthest-point: each later pick's distance-to-chosen can
    // only shrink (the chosen set grows)
    val ds = rows.drop(1).map(_.getAs[Double]("dmin"))
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => b <= a + 1e-9 },
      s"radius not non-increasing: ${ds.toSeq}")
  }
}
