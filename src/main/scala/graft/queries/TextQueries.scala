package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** LLM-data-pipeline text operators over `documents` (driver mandate:
  * dedup, text analysis, multimodal plumbing — SURVEY §0). Every query has
  * an exact DuckDB oracle; shared constants (stopwords, markers, minhash
  * seeds) come from [[graft.functions.Text]] and the oracle SQL is
  * *generated* from them so the two sides cannot drift.
  */
object TextQueries {

  private val stopList = Text.stopwords.map(w => s"'$w'").mkString(", ")
  private def markerList(lang: String): String =
    Text.langMarkers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")

  // DuckDB fragments mirroring Text.* definitions exactly.
  private val duckTokens = """string_split_regex(trim(lower(text)), '\s+')"""
  private def duckMarkerCount(lang: String): String =
    s"len(list_filter($duckTokens, x -> x IN (${markerList(lang)})))"

  /** Language-ID CASE, generated from Text.langMarkers with the same fixed
    * tie-break order (en, de, fr, es). */
  private val duckLangId: String = {
    val Seq(en, de, fr, es) = Seq("en", "de", "fr", "es").map(duckMarkerCount)
    s"""CASE WHEN $en + $de + $fr + $es = 0 THEN 'und'
       | WHEN $en >= greatest($de, $fr, $es) THEN 'en'
       | WHEN $de >= greatest($fr, $es) THEN 'de'
       | WHEN $fr >= $es THEN 'fr'
       | ELSE 'es' END""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(

    // q24 — exact deduplication: hash-groupBy on content digest, keep
    // lowest doc_id (the scalable exact-dedup primitive: one shuffle on
    // the digest, no driver state).
    QuerySpec("q24_docs_exact_dedup",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .orderBy("keep_id"),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // q25 — token counting (whitespace tokenization) + byte/char lengths.
    QuerySpec("q25_token_counts",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(col("doc_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          octet_length(col("text")).as("n_bytes"),
          length(col("text")).as("n_chars_m"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              | CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
              | CAST(strlen(text) AS INTEGER) AS n_bytes,
              | CAST(length(text) AS INTEGER) AS n_chars_m
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // q26 — quality scoring: punctuation ratio + stopword ratio, the
    // standard cheap text-quality heuristics.
    QuerySpec("q26_quality_score",
      (s, dir) => {
        val nTok  = Text.tokenCount(col("text"))
        val nStop = Text.stopwordCount(col("text"))
        val nPun  = Text.punctCount(col("text"))
        Tables.load(s, dir, "documents").select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          nPun.as("n_punct"),
          nStop.as("n_stop"),
          nTok.as("n_tokens"),
          round(nStop.cast("double") / nTok, 4).as("stop_ratio"),
          round(nPun.cast("double") / length(col("text")), 4).as("punct_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              | CAST(length(text) AS INTEGER) AS n_chars_m,
              | CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS INTEGER) AS n_punct,
              | CAST(len(list_filter($duckTokens, x -> x IN ($stopList))) AS INTEGER) AS n_stop,
              | CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
              | round(CAST(len(list_filter($duckTokens, x -> x IN ($stopList))) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')), 4) AS stop_ratio,
              | round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // q27 — language identification (marker-word heuristic, deterministic
    // tie-break), with the dataset's label for comparison.
    QuerySpec("q27_lang_id",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"),
          Text.langId(col("text")).as("lang_pred"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, $duckLangId AS lang_pred
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // q28 — document fingerprinting: md5 over normalized text.
    QuerySpec("q28_fingerprint",
      (s, dir) =>
        Tables.load(s, dir, "documents").select(col("doc_id"),
          Text.fingerprint(col("text")).as("fp"),
          substring(Text.fingerprint(col("text")), 1, 8).as("fp_short"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             | md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
             | substr(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 8) AS fp_short
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // q29 — MinHash-LSH near-duplicate candidates: shingle → minhash
    // signature → band → bucket self-join. All set-oriented: explode +
    // groupBy + equi-join, the 100 TB-scalable LSH shape (candidate pairs
    // only ever meet inside a band bucket; no O(n²) cross join).
    QuerySpec("q29_minhash_pairs",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val ex = docs.select(col("doc_id"),
          explode(Text.shingles(col("text"))).as("sh"))
        val mins = Text.minhashSeeds.map(i =>
          min(md5(concat(lit(i.toString), col("sh")))).as(s"m$i"))
        val sig = ex.groupBy("doc_id").agg(mins.head, mins.tail: _*)
        val nBands = Text.minhashSeeds.size / Text.bandSize
        val bandCols = (0 until nBands).map { b =>
          val lo = b * Text.bandSize
          struct(lit(b).as("band_idx"),
            md5(concat_ws("|", (lo until lo + Text.bandSize).map(i => col(s"m$i")): _*)).as("band_val"))
        }
        val bands = sig.select(col("doc_id"),
            explode(array(bandCols: _*)).as("b"))
          .select(col("doc_id"), col("b.band_idx"), col("b.band_val"))
        val a = bands.as("a")
        val b = bands.as("b")
        a.join(b, col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val seeds = Text.minhashSeeds
        val minExprs = seeds.map(i => s"min(md5('$i' || sh)) AS m$i").mkString(", ")
        val nBands = seeds.size / Text.bandSize
        val bandExprs = (0 until nBands).map { b =>
          val lo = b * Text.bandSize
          val cat = (lo until lo + Text.bandSize).map(i => s"m$i").mkString(" || '|' || ")
          s"SELECT doc_id, $b AS band_idx, md5($cat) AS band_val FROM sig"
        }.mkString(" UNION ALL ")
        s"""WITH toks AS (SELECT doc_id, $duckTokens AS w FROM documents),
           |ex AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
           |       FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
           |sig AS (SELECT doc_id, $minExprs FROM ex GROUP BY doc_id),
           |bands AS ($bandExprs)
           |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |FROM bands a JOIN bands b
           |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
           |ORDER BY doc_a, doc_b""".stripMargin
      }),

    // q30 — multimodal-column plumbing: treat the payload as opaque bytes
    // and run an imperative per-partition "decode" (SURVEY §0 driver
    // mandate). The decode itself is a clearly-marked deterministic STUB
    // (no media libs in this container); the Spark-side shape — binary
    // payload, mapPartitions batch processing, typed output schema — is
    // real. At scale this is a narrow (no-shuffle) transform.
    QuerySpec("q30_binary_meta",
      (s, dir) => {
        import s.implicits._
        val ds = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
        ds.mapPartitions(_.map { case (id, txt) =>
          val payload = txt.getBytes("UTF-8") // stand-in for image/audio bytes
          val nBytes = payload.length
          // STUB decode: real decoders (JPEG/audio) are not available in
          // this container; dimensions are a deterministic fake derived
          // from payload size so the oracle can verify the plumbing.
          val width  = 64 + nBytes % 576
          val height = 64 + (nBytes * 7) % 416
          val firstByte = payload(0) & 0xff
          (id, nBytes, width, height, firstByte)
        }).toDF("doc_id", "n_bytes", "width", "height", "first_byte")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             | CAST(strlen(text) AS INTEGER) AS n_bytes,
             | CAST(64 + strlen(text) % 576 AS INTEGER) AS width,
             | CAST(64 + (strlen(text) * 7) % 416 AS INTEGER) AS height,
             | CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
             |FROM documents ORDER BY doc_id""".stripMargin)))
}
