package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale document pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All are pure
  * `Column` algebra (codegen'd, no UDFs) so they stay inside
  * whole-stage codegen over 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokens of a document.
    *
    * Callers evaluating several metrics per document should materialize
    * this (and `tokens(lower(text))`) ONCE with `withColumn` and use the
    * `*Of` variants below: higher-order Columns run interpreted with no
    * common-subexpression elimination, so every metric that re-derives
    * the token array re-splits the whole document.
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))

  def tokenCountOf(toks: Column): Column = size(toks)

  /** BPE-ish subword count: word pieces of ≤4 chars — a deterministic
    * stand-in for a real tokenizer's token count (≈ chars/4 bounded by
    * word structure), computed from the same split.
    */
  def subwordCount(text: Column): Column = subwordCountOf(tokens(text))

  def subwordCountOf(toks: Column): Column =
    aggregate(toks, lit(0),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("int"))

  /** Ratio of punctuation chars to total chars. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n > 0, (n - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]{}-]", ""))).cast("double") / n)
      .otherwise(0.0)
  }

  /** Mean token length. */
  def meanTokenLength(text: Column): Column = meanTokenLengthOf(tokens(text))

  def meanTokenLengthOf(ts: Column): Column =
    when(size(ts) > 0,
      aggregate(ts, lit(0), (acc, w) => acc + length(w)).cast("double") / size(ts))
      .otherwise(0.0)

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be", "are")

  /** Fraction of tokens that are (lowercased) stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column =
    stopwordRatioOf(tokens(lower(text)), stopwords)

  /** Over pre-lowercased tokens (`tokens(lower(text))`). */
  def stopwordRatioOf(ts: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(ts) > 0,
      size(filter(ts, t => array_contains(sw, t))).cast("double") / size(ts))
      .otherwise(0.0)
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, non-degenerate mean word length, some stopword mass —
    * the classic cheap pre-filter for LLM training corpora.
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(text, tokens(text), tokens(lower(text)))

  /** Over pre-materialized `tokens(text)` / `tokens(lower(text))`. */
  def qualityScoreOf(text: Column, toks: Column, ltoks: Column): Column = {
    val nTok = tokenCountOf(toks).cast("double")
    val lengthScore = least(nTok / lit(50.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val mtl = meanTokenLengthOf(toks)
    val wordScore = when(mtl >= 3.0 && mtl <= 10.0, 1.0).otherwise(0.5)
    val swScore = least(stopwordRatioOf(ltoks) * 5.0, lit(1.0))
    round((lengthScore * 0.4 + punctScore * 0.2 + wordScore * 0.2 + swScore * 0.2), 6)
  }

  /** Language profiles: tiny per-language marker-word sets (n-gram
    * heuristic reduced to its word level). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不"))

  /** Marker-hit count for one language. */
  def langHits(text: Column, markers: Seq[String]): Column =
    langHitsOf(tokens(lower(text)), markers)

  def langHitsOf(ts: Column, markers: Seq[String]): Column = {
    val mk = array(markers.map(lit): _*)
    size(filter(ts, t => array_contains(mk, t)))
  }

  /** Heuristic language ID: the language with the most marker hits;
    * "und" (undetermined) when nothing matches. Ties break by profile
    * order (en first) — deterministic.
    */
  def langId(text: Column): Column = langIdOf(tokens(lower(text)))

  /** Over pre-lowercased tokens — one scan per language profile instead
    * of one tokenization + scan. */
  def langIdOf(ltoks: Column): Column = {
    val scored = langProfiles.zipWithIndex.map { case ((lang, markers), i) =>
      struct(langHitsOf(ltoks, markers).as("hits"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Content fingerprint: hash of whitespace-normalized, lowercased text
    * — exact-dup detection key. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** 64-bit rolling-style hash (xxhash64 of the normalized text) for
    * compact dup keys at scale. */
  def fingerprint64(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(lower(text))))

  /** Distinct character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = concat_ws(" ", tokens(lower(text)))
    val idx = sequence(lit(1), greatest(length(norm) - lit(n - 1), lit(1)))
    array_distinct(transform(idx, i => norm.substr(i, lit(n))))
  }

  /** Distinct word n-gram shingles. */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(lower(text))
    val idx = sequence(lit(0), greatest(size(ts) - lit(n), lit(0)))
    array_distinct(transform(idx, i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }
}
