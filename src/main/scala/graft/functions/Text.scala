package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Text-analysis primitives for the LLM-data-pipeline extension surface
  * (driver mandate, SURVEY §0/§7.2 step 7), over `documents.text`.
  *
  * Everything is a built-in-function composition (split / filter /
  * transform higher-order functions) — codegen-friendly, no UDFs, and each
  * has an exactly-equivalent DuckDB SQL form used by the oracles. Shared
  * constant lists (stopwords, language markers, minhash seeds) live here so
  * Spark code and generated oracle SQL can never drift apart.
  */
object Text {

  /** Whitespace tokenization. `trim` first so neither engine produces
    * leading/trailing empty tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical form for fingerprinting: lowercase, collapsed whitespace. */
  def normalize(text: Column): Column =
    lower(regexp_replace(text, "\\s+", " "))

  /** Document fingerprint — md5 over the normalized text (hex string is
    * identical across engines, unlike murmur-based `hash()`). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(stopwords)))

  /** Punctuation count = chars removed by stripping [a-zA-Z0-9 ]. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))

  /** Language-ID marker words, scored per language with a fixed tie-break
    * order (en, de, fr, es). An n-gram/stopword heuristic, not a model —
    * deterministic and SQL-expressible by design. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "with"),
    "de" -> Seq("der", "und", "die", "mit"),
    "fr" -> Seq("le", "et", "la", "avec"),
    "es" -> Seq("el", "y", "los", "con"))

  private def markerCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(words)))

  def langId(text: Column): Column = {
    val Seq(en, de, fr, es) = langMarkers.map { case (_, w) => markerCount(text, w) }
    when(en + de + fr + es === 0, lit("und"))
      .when(en >= greatest(de, fr, es), lit("en"))
      .when(de >= greatest(fr, es), lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Word n-gram shingles (default 3) from an ALREADY-BOUND token-array
    * column; fewer than n tokens → empty array (exploding drops the
    * document, matching DuckDB's UNNEST of an empty list).
    *
    * `tk` must be a projected column, not an inline `split(...)`
    * expression: higher-order lambdas don't share subexpressions, so an
    * inline split would re-tokenize the document for every element
    * reference. Per-element `element_at` instead of `slice` — slice copies
    * an array per position, which made shingling 6× slower at sf0.1. */
  def shinglesFromTokens(tk: Column, n: Int = 3): Column =
    when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(tk, i + lit(j))): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Convenience form over raw text — correct but slow (re-tokenizes per
    * element reference); use [[shinglesFromTokens]] after binding the
    * token array in a projection for anything beyond unit tests. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(lower(text)), n)

  /** Minhash parameters: each shingle is hashed ONCE (md5 → first 8 hex
    * chars → 32-bit int, portable across engines unlike murmur `hash()`),
    * then permuted by k cheap LCG maps `h_i = (a_i*h + b_i) mod (2^31-1)`;
    * the signature is the per-doc min of each. One expensive hash + k
    * integer ops beats k md5s, and integer min-agg buffers are far cheaper
    * to shuffle than 32-char strings. With bands of `bandSize` consecutive
    * signatures, a candidate-duplicate pair is any two docs sharing a band
    * value — the standard shingle → minhash → band → bucket-join LSH
    * pipeline. a_i < 2^28 and h < 2^32 keep a_i*h + b_i < 2^63 (no
    * overflow in either engine). */
  val minhashParams: Seq[(Long, Long)] = Seq(
    (1664525L, 1013904223L), (22695477L, 1L), (69069L, 362437L),
    (1103515245L, 12345L), (134775813L, 1L), (214013L, 2531011L),
    (16807L, 0L), (48271L, 0L))
  val minhashMod: Long = 2147483647L
  val bandSize: Int = 2

  /** Portable 32-bit shingle/token hash: md5 hex prefix as integer.
    * Oracle form: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT).
    * Runs as the fused [[Hash32]] codegen expression (no hex string
    * round-trip); registered by GraftFunctions on every engine session
    * (SparkEntry.configure, Tuned clones, TestSpark). */
  def hash32(c: Column): Column =
    call_function("graft_hash32", c)

  /** Content-defined chunking, boundary half: 1-based positions of tokens
    * whose portable hash ≡ 0 (mod `mod`) — a chunk ends at each such
    * token (expected chunk length ≈ mod). Boundaries depend only on the
    * token itself, so chunking is SHIFT-INVARIANT: an edit perturbs at
    * most the chunk it lands in and re-aligns at the next boundary
    * (asserted in TextSpec). Bind the result to a real column before
    * [[cdcChunks]] — it is referenced twice there and HOF lambdas defeat
    * subexpression elimination. */
  def cdcBoundaries(tk: Column, mod: Int = 13): Column =
    filter(sequence(lit(1), size(tk)),
      i => hash32(element_at(tk, i)) % mod === 0)

  /** Content-defined chunking, assembly half: chunk ranges from BOUND
    * token-array + boundary-position columns, as an array of
    * struct(s, e, chunk) over inclusive 1-based [s..e]; callers drop
    * empty ranges with e >= s. Per-chunk `slice` copies partition the
    * token array, so total work is O(tokens) (unlike per-element slice,
    * NOTES perf rule). */
  def cdcChunks(tk: Column, bpos: Column): Column =
    zip_with(
      concat(array(lit(1)), transform(bpos, p => p + 1)),
      concat(bpos, array(size(tk))),
      (a, b) => struct(a.as("s"), b.as("e"),
        concat_ws(" ", slice(tk, a, b - a + 1)).as("chunk")))

  /** Character-trigram language profiles — the n-gram half of the lang-ID
    * mandate (q67; [[langMarkers]]/q27 is the word-marker half). Scores
    * are chars removed by non-overlapping left-to-right replace of each
    * trigram — identical semantics in Spark and DuckDB `replace`. Fixed
    * tie-break order (en, de, fr, es), like [[langId]]. */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "ing"),
    "de" -> Seq("der", "sch", "ein"),
    "fr" -> Seq("les", "ent", "que"),
    "es" -> Seq("los", " el", "ado"))
}
