package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar operators for document pipelines: token
  * counting, quality metrics, a stopword-based language-ID heuristic,
  * and content fingerprinting. All built-in-function compositions —
  * per-row, embarrassingly parallel, no shuffle.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column = Dedup.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Mean token length (a cheap quality signal: very short or very
    * long mean token length indicates boilerplate/noise).
    */
  def avgTokenLength(text: Column): Column = {
    val t = tokens(text)
    aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x)
      .cast("double") / size(t)
  }

  private def countIn(t: Column, words: Seq[String]): Column =
    size(filter(t, x => words.map(w => x === w).reduce(_ || _)))

  /** Fraction of tokens that are (language-agnostic) stopwords. High
    * ratio = natural prose; near-zero = tables/code/noise.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val t = tokens(text)
    countIn(t, stopwords).cast("double") / size(t)
  }

  /** Stopword-occurrence language-ID heuristic: score each candidate
    * language by marker-word hits, predict the argmax (ties resolved in
    * en > es > de order), `und` when nothing matches. This is the
    * classic cheap n-gram/stopword LID; swap in real marker lists per
    * deployment corpus.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = countIn(t, Seq("the", "a"))
    val es = countIn(t, Seq("el", "la", "de", "que"))
    val de = countIn(t, Seq("der", "die", "und", "das"))
    when(en >= es && en >= de && en > 0, lit("en"))
      .when(es > en && es >= de, lit("es"))
      .when(de > 0, lit("de"))
      .otherwise(lit("und"))
  }

  /** GPT-2-style pre-tokenizer classes: letter runs, digit runs,
    * single punctuation marks. RE2-compatible, so the same pattern runs
    * in Spark (Java regex) and columnar SQL engines.
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** BPE-ish tokenization via `regexp_extract_all` — the
    * subword-friendly token stream an LLM-data pipeline counts against
    * budgets (vs the whitespace [[tokens]]).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeishPattern), lit(0))

  def bpeishTokenCount(text: Column): Column =
    size(bpeishTokens(text)).cast("long")

  /** Whitespace-normalized content fingerprint (md5 of the lowercased,
    * trimmed, space-collapsed text). Equal fingerprints = exact dup
    * after normalization; cheap first-stage dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Fraction of tokens that are purely alphabetic (Gopher's
    * "80% of words contain at least one alphabetic character" rule,
    * tightened to alpha-only since [[tokens]] lowercases).
    */
  def alphaTokenRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, x => x.rlike("^[a-z]+$"))).cast("double") / size(t)
  }

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    * word-count bounds, mean-word-length band, minimum alphabetic-word
    * fraction, and at-least-one-stopword. Returns a struct of the
    * individual verdicts plus the conjunction, so a pipeline can both
    * filter on `keep` and report per-rule rejection counts.
    */
  def gopherFlags(
      text: Column,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.8): Column = {
    val n = tokenCount(text)
    val mean = avgTokenLength(text)
    val alpha = alphaTokenRatio(text)
    val stop = stopwordRatio(text)
    val okCount = n >= minTokens && n <= maxTokens
    val okMean = mean >= minMeanLen && mean <= maxMeanLen
    val okAlpha = alpha >= minAlphaRatio
    val okStop = stop > 0
    struct(
      okCount.as("ok_count"),
      okMean.as("ok_mean_len"),
      okAlpha.as("ok_alpha"),
      okStop.as("ok_stop"),
      (okCount && okMean && okAlpha && okStop).as("keep"))
  }

  /** Canonical URL for dedup keying: strip fragment and query string,
    * lowercase the scheme://host part, drop trailing slashes. Pure
    * regexp composition, so the identical normalization runs in any
    * engine with RE2-class regexes.
    */
  def normalizeUrl(url: Column): Column = {
    val noFragment = regexp_replace(url, "#.*$", "")
    val noQuery = regexp_replace(noFragment, "\\?.*$", "")
    val lowered = concat(
      lower(regexp_extract(noQuery, "^([^/]*//[^/]*)", 1)),
      regexp_replace(noQuery, "^[^/]*//[^/]*", ""))
    regexp_replace(lowered, "/+$", "")
  }
}
