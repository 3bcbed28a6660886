package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis scalar operators for document pipelines: token
  * counting, quality metrics, a stopword-based language-ID heuristic,
  * and content fingerprinting. All built-in-function compositions —
  * per-row, embarrassingly parallel, no shuffle.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column = Dedup.tokens(text)

  /** DuckDB rendering of [[tokens]] — the single oracle twin of the
    * tokenization every text operator shares. Any change to [[tokens]]
    * changes this in lockstep (and vice versa) instead of drifting
    * across per-operator SQL strings.
    */
  def tokensSql(textExpr: String): String =
    s"list_filter(string_split(lower($textExpr), ' '), x -> x <> '')"

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** NULL-on-empty division: Spark 4 runs ANSI mode by default, where
    * x/0 THROWS instead of returning null — every ratio over a
    * possibly-empty token array must guard the divisor.
    */
  private def safeRatio(num: Column, denom: Column): Column =
    when(denom > 0, num.cast("double") / denom)

  /** Mean token length (a cheap quality signal: very short or very
    * long mean token length indicates boilerplate/noise). NULL for
    * empty documents.
    */
  def avgTokenLength(text: Column): Column = {
    val t = tokens(text)
    safeRatio(aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x), size(t))
  }

  private def countIn(t: Column, words: Seq[String]): Column =
    size(filter(t, x => words.map(w => x === w).reduce(_ || _)))

  /** Fraction of tokens that are (language-agnostic) stopwords. High
    * ratio = natural prose; near-zero = tables/code/noise.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val t = tokens(text)
    safeRatio(countIn(t, stopwords), size(t))
  }

  /** Stopword-occurrence language-ID heuristic: score each candidate
    * language by marker-word hits, predict the argmax (ties resolved in
    * en > es > de order), `und` when nothing matches. This is the
    * classic cheap n-gram/stopword LID; swap in real marker lists per
    * deployment corpus.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = countIn(t, LangStopwords("en"))
    val es = countIn(t, LangStopwords("es"))
    val de = countIn(t, LangStopwords("de"))
    when(en >= es && en >= de && en > 0, lit("en"))
      .when(es > en && es >= de, lit("es"))
      .when(de > 0, lit("de"))
      .otherwise(lit("und"))
  }

  /** Mixed-language (code-switching) signals for one document: the
    * per-language stopword hit counts behind [[langId]], reduced to
    * (primary hits, secondary hits). A document whose second-best
    * language scores close to the best is bilingual or boilerplate-
    * contaminated — material most monolingual training mixes drop or
    * route to a translation-pair pipeline. Integer counts only, so the
    * mixed verdict (`2 * secondary >= primary`) is exact in any
    * engine.
    */
  def langHitsPrimary(text: Column): Column = {
    val t = tokens(text)
    greatest(countIn(t, LangStopwords("en")), countIn(t, LangStopwords("es")),
      countIn(t, LangStopwords("de"))).cast("long")
  }

  /** Second-highest per-language stopword hit count — see
    * [[langHitsPrimary]].
    */
  def langHitsSecondary(text: Column): Column = {
    val t = tokens(text)
    val en = countIn(t, LangStopwords("en"))
    val es = countIn(t, LangStopwords("es"))
    val de = countIn(t, LangStopwords("de"))
    (en + es + de - greatest(en, es, de) - least(en, es, de)).cast("long")
  }

  /** The stopword lists [[langId]] scores against (also the SQL twin's
    * source of truth).
    */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"))

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
    * tightened to alpha-only since [[tokens]] lowercases). NULL for
    * empty documents.
    */
  def alphaTokenRatio(text: Column): Column = {
    val t = tokens(text)
    safeRatio(size(filter(t, x => x.rlike("^[a-z]+$"))), size(t))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    * word-count bounds, mean-word-length band, minimum alphabetic-word
    * fraction, and at-least-one-stopword. Returns a struct of the
    * individual verdicts plus the conjunction, so a pipeline can both
    * filter on `keep` and report per-rule rejection counts.
    *
    * `toks` must be a BOUND token-array column (tokenize in its own
    * projection first, like q57 does): the four metrics reference the
    * array ~8 times, and interpreted higher-order functions re-evaluate
    * a derived-array argument on every call site.
    */
  def gopherFlagsFromTokens(
      toks: Column,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.8): Column = {
    val n = size(toks).cast("long")
    val mean = safeRatio(
      aggregate(transform(toks, x => length(x)), lit(0), (a, x) => a + x), size(toks))
    val alpha = safeRatio(size(filter(toks, x => x.rlike("^[a-z]+$"))), size(toks))
    val okCount = n >= minTokens && n <= maxTokens
    // empty docs: NULL ratios must reject, not propagate NULL verdicts
    val okMean = coalesce(mean >= minMeanLen && mean <= maxMeanLen, lit(false))
    val okAlpha = coalesce(alpha >= minAlphaRatio, lit(false))
    val okStop = countIn(toks, Seq("the", "a")) > 0
    struct(
      okCount.as("ok_count"),
      okMean.as("ok_mean_len"),
      okAlpha.as("ok_alpha"),
      okStop.as("ok_stop"),
      (okCount && okMean && okAlpha && okStop).as("keep"))
  }

  /** [[gopherFlagsFromTokens]] over freshly tokenized text — fine for
    * one-off scalar use; batch pipelines should tokenize once and use
    * the token-array form.
    */
  def gopherFlags(
      text: Column,
      minTokens: Long = 50,
      maxTokens: Long = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.8): Column =
    gopherFlagsFromTokens(tokens(text), minTokens, maxTokens,
      minMeanLen, maxMeanLen, minAlphaRatio)

  /** Overlapping token-window chunks — the pre-tokenizer shaping step
    * of a training pipeline (context-window packing starts from these).
    * One row per (doc, chunk): `chunk_id`, `n_tokens`, and the chunk's
    * md5 fingerprint. Chunks cover `chunkSize` tokens and start every
    * `stride` tokens (overlap = chunkSize - stride). EVERY token lands
    * in at least one chunk: when (n - chunkSize) is not a multiple of
    * stride, the tail is covered by a final shorter chunk (start
    * offsets run to the end of the document, and a start whose tokens
    * are already fully covered by the previous chunk is dropped). A
    * document shorter than one chunk yields a single short chunk.
    *
    * The token array is materialized in its own projection and the
    * start offsets exploded OUTSIDE any lambda — higher-order functions
    * run interpreted without common-subexpression elimination, so
    * slicing inside `transform` would re-tokenize per chunk.
    */
  def tokenChunks(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val n = size(col("__toks"))
    val chunk = slice(col("__toks"), col("__start") + 1, lit(chunkSize))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), greatest(n - 1, lit(0)), lit(stride))).as("__start"))
      // keep a start iff it contributes tokens the previous chunk missed
      .filter(col("__start") === 0 || col("__start") + (chunkSize - stride) < n)
      .select(
        col(idCol),
        (col("__start") / stride).cast("long").as("chunk_id"),
        size(chunk).cast("long").as("n_tokens"),
        md5(concat_ws(" ", chunk)).as("fp"))
  }

  /** Explicit Latin-1 accent fold table, shared verbatim with the SQL
    * oracle — `translate` maps char-for-char identically in every
    * engine, unlike locale-dependent Unicode normalizers.
    */
  val AccentFrom: String =
    "àáâãäåèéêëìíîïòóôõöùúûüýÿçñÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÇÑ"
  val AccentTo: String =
    "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN"

  /** Text cleanup for dedup keying and corpus hygiene: strip
    * non-whitespace control characters, fold Latin-1 accents through
    * the explicit [[AccentFrom]]/[[AccentTo]] table, collapse runs of
    * whitespace to one space, trim. Every step is a codegen'd built-in
    * (`regexp_replace`/`translate`), and the control-strip removes
    * `\x0B` BEFORE the `\s+` collapse so Java-regex and RE2 engines
    * (which disagree on whether `\s` matches vertical tab) normalize
    * identically.
    */
  def normalizeText(c: Column): Column = {
    val noCtl = regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val folded = translate(noCtl, AccentFrom, AccentTo)
    trim(regexp_replace(folded, "\\s+", " "))
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

  /** Per-group Shannon entropy of the token distribution, in nats —
    * the corpus-diversity signal (a source whose entropy collapses is
    * template spam). Uses the identity `H = ln T - (Σ c·ln c)/T` so
    * the only per-term float is `ln c`, rounded to 9 decimals and
    * decimal-summed exactly (the cross-engine determinism scheme of
    * q89); ln T runs once on the exact total. Returns
    * (group, n_tokens, n_vocab, entropy).
    */
  def tokenEntropy(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val g = col(groupCol)
    val counts = docs
      .select(g, explode(tokens(col(textCol))).as("term"))
      .groupBy(g, col("term")).agg(count(lit(1)).as("c"))
    counts
      .groupBy(g)
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        // decimal(18,0) cast: long * decimal(18,9) clamps to a ROUNDED
        // decimal(38,8); (18,0) x (18,9) stays exact at scale 9
        sum(col("c").cast("decimal(18,0)") *
            round(log(col("c").cast("double")), 9).cast("decimal(18,9)"))
          .as("__slc"))
      .select(g, col("n_tokens"), col("n_vocab"),
        round(log(col("n_tokens").cast("double")) -
          col("__slc").cast("double") / col("n_tokens"), 6).as("entropy"))
      .orderBy(g)
  }

  /** DuckDB SQL equivalent of [[tokenEntropy]]. */
  def tokenEntropySql(src: String, groupCol: String, textCol: String): String =
    s"""WITH toks AS (
       |  SELECT $groupCol, unnest(${tokensSql(textCol)}) AS term
       |  FROM $src),
       |c AS (SELECT $groupCol, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       |s AS (SELECT $groupCol, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |        COUNT(*) AS n_vocab,
       |        SUM(CAST(c AS DECIMAL(18,0)) * CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))) AS slc
       |      FROM c GROUP BY 1)
       |SELECT $groupCol, n_tokens, n_vocab,
       |  round(ln(CAST(n_tokens AS DOUBLE)) - CAST(slc AS DOUBLE) / n_tokens, 6) AS entropy
       |FROM s ORDER BY 1""".stripMargin

  /** Gopher's duplicate-n-gram signal (Rae et al. 2021, §A1.1): per
    * document, the fraction of characters covered by token n-grams
    * that occur more than once IN THAT DOCUMENT — the repetition cue
    * that catches boilerplate/listicle spam which token-level ratios
    * ([[gopherFlagsFromTokens]], q64) miss. Every occurrence of a
    * duplicated gram counts its full character length (overlaps
    * double-count, as in the original).
    *
    * The sliding n-gram stream is a per-row `transform` over the bound
    * token array — pairing happens inside the scan projection, no
    * shuffle to build grams. Two partial-aggregated groupBys follow
    * ((doc, gram) counts, then the per-doc rollup); all arithmetic is
    * exact integers until one final double division rounded to 6.
    * Documents with fewer than `n` tokens emit no grams and no row.
    * Returns (id, n_grams, dup_frac).
    */
  def dupNgramCharFrac(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val id = col(idCol)
    docs
      .select(id, length(col(textCol)).cast("long").as("__nc"),
        tokens(col(textCol)).as("__a"))
      .select(id, col("__nc"), explode(expr(
        s"transform(slice(__a, 1, greatest(size(__a) - ${n - 1}, 0)), " +
          s"(w, i) -> concat_ws(' ', slice(__a, i + 1, $n)))")).as("gram"))
      .groupBy(id, col("__nc"), col("gram")).agg(count(lit(1)).as("__c"))
      .groupBy(id, col("__nc"))
      .agg(sum(col("__c")).as("n_grams"),
        sum(when(col("__c") >= 2, col("__c") * length(col("gram")).cast("long"))
          .otherwise(0L)).as("__dup"))
      .select(id, col("n_grams"),
        round(col("__dup").cast("double") / col("__nc"), 6).as("dup_frac"))
      .orderBy(idCol)
  }

  /** DuckDB SQL equivalent of [[dupNgramCharFrac]] (`where` narrows the
    * source table, e.g. "doc_id < 200").
    */
  def dupNgramCharFracSql(src: String, idCol: String, textCol: String,
      n: Int = 5, where: String = "TRUE"): String =
    s"""WITH t AS (SELECT $idCol, CAST(length($textCol) AS BIGINT) AS nc,
       |    ${tokensSql(textCol)} AS a
       |  FROM $src WHERE $where),
       |g AS (SELECT $idCol, nc,
       |    unnest(list_transform(range(1, len(a) - ${n - 2}),
       |      i -> array_to_string(a[CAST(i AS INT):CAST(i AS INT) + ${n - 1}], ' '))) AS gram
       |  FROM t),
       |c AS (SELECT $idCol, nc, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
       |d AS (SELECT $idCol, nc, CAST(SUM(c) AS BIGINT) AS n_grams,
       |        CAST(SUM(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) AS BIGINT) AS dup
       |      FROM c GROUP BY 1, 2)
       |SELECT $idCol, n_grams, round(CAST(dup AS DOUBLE) / nc, 6) AS dup_frac
       |FROM d ORDER BY $idCol""".stripMargin

  /** Per-group KL divergence of the group's token distribution from
    * the corpus-wide distribution — the canonical "has this source
    * drifted from the mix" signal (DoReMi-style domain weighting
    * starts from exactly these numbers). KL(P_g || P) is finite with
    * no smoothing needed: every token of group g exists in the corpus,
    * so p(t) > 0 wherever p_g(t) > 0.
    *
    * Same determinism scheme as [[tokenEntropy]]/q89: the only per-term
    * float is one `ln`, rounded to 9 decimals and decimal-summed
    * exactly; the single division by n_g happens once per group on the
    * exact decimal sum. Shuffles: one partial-aggregated (group, term)
    * count, a term-keyed join against the corpus counts, and the final
    * per-group rollup. Returns (group, n_tokens, kl).
    */
  def tokenKlDrift(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val st = docs
      .select(col(groupCol).as("g"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("g"), col("term")).agg(count(lit(1)).as("cst"))
    val ct = st.groupBy(col("term")).agg(sum(col("cst")).as("ct"))
    val ns = st.groupBy(col("g")).agg(sum(col("cst")).as("ns"))
    val n = st.agg(sum(col("cst")).as("n"))
    st.join(ct, "term").join(ns, "g").crossJoin(broadcast(n))
      .select(col("g"), col("ns"),
        (col("cst").cast("decimal(18,0)") *
          round(log(col("cst").cast("double") * col("n") /
            (col("ns").cast("double") * col("ct"))), 9).cast("decimal(18,9)"))
          .as("__t"))
      .groupBy(col("g"), col("ns"))
      .agg(round(sum(col("__t")).cast("double") / col("ns"), 6).as("kl"))
      .select(col("g").as(groupCol), col("ns").as("n_tokens"), col("kl"))
      .orderBy(groupCol)
  }

  /** DuckDB SQL equivalent of [[tokenKlDrift]]. */
  def tokenKlDriftSql(src: String, groupCol: String, textCol: String): String =
    s"""WITH toks AS (
       |  SELECT $groupCol AS g, unnest(${tokensSql(textCol)}) AS term
       |  FROM $src),
       |st AS (SELECT g, term, COUNT(*) AS cst FROM toks GROUP BY 1, 2),
       |ct AS (SELECT term, SUM(cst) AS ct FROM st GROUP BY 1),
       |ns AS (SELECT g, CAST(SUM(cst) AS BIGINT) AS ns FROM st GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cst) AS BIGINT) AS n FROM st),
       |terms AS (SELECT st.g, ns.ns,
       |    CAST(st.cst AS DECIMAL(18,0)) *
       |      CAST(round(ln(CAST(st.cst AS DOUBLE) * tot.n /
       |        (CAST(ns.ns AS DOUBLE) * ct.ct)), 9) AS DECIMAL(18,9)) AS t
       |  FROM st JOIN ct USING (term) JOIN ns USING (g) CROSS JOIN tot)
       |SELECT g AS $groupCol, ns AS n_tokens,
       |  round(CAST(SUM(t) AS DOUBLE) / ns, 6) AS kl
       |FROM terms GROUP BY g, ns ORDER BY 1""".stripMargin

  /** Pairwise vocabulary Jaccard overlap between groups (sources):
    * which slices of a corpus are near-copies of each other at the
    * vocabulary level. One distinct (group, term) projection,
    * self-joined on term — term-keyed, partial-aggregated, no
    * quadratic blowup beyond the true pair co-occurrences. Returns
    * (g1, g2, n_inter, jaccard).
    */
  def vocabOverlap(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val gv = docs
      .select(col(groupCol).as("g"), explode(tokens(col(textCol))).as("term"))
      .distinct()
    val sizes = gv.groupBy(col("g")).agg(count(lit(1)).as("nv"))
    val inter = gv.as("a").join(gv.as("b"),
        col("a.term") === col("b.term") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("g" -> "g1", "nv" -> "__v1")), "g1")
      .join(sizes.withColumnsRenamed(Map("g" -> "g2", "nv" -> "__v2")), "g2")
      .select(col("g1"), col("g2"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("__v1") + col("__v2") - col("n_inter")), 6).as("jaccard"))
      .orderBy(col("g1"), col("g2"))
  }

  /** DuckDB SQL equivalent of [[vocabOverlap]]. */
  def vocabOverlapSql(src: String, groupCol: String, textCol: String): String =
    s"""WITH gv AS (
       |  SELECT DISTINCT $groupCol AS g,
       |    unnest(${tokensSql(textCol)}) AS term
       |  FROM $src),
       |sizes AS (SELECT g, COUNT(*) AS nv FROM gv GROUP BY 1),
       |inter AS (SELECT a.g AS g1, b.g AS g2, COUNT(*) AS n_inter
       |          FROM gv a JOIN gv b ON a.term = b.term AND a.g < b.g
       |          GROUP BY 1, 2)
       |SELECT g1, g2, n_inter,
       |  round(CAST(n_inter AS DOUBLE) / (s1.nv + s2.nv - n_inter), 6) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON inter.g1 = s1.g
       |JOIN sizes s2 ON inter.g2 = s2.g
       |ORDER BY 1, 2""".stripMargin

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS algorithm): hash every token `k`-gram, slide
    * a `w`-hash window, and select each window's MINIMUM hash, ties to
    * the RIGHTMOST position (robust winnowing). Guarantees: at least
    * one selection in every `w` consecutive hashes (bounded gap), and
    * any token run of `w + k - 1` shared between two documents yields
    * a shared fingerprint — the matching guarantee copy detectors rely
    * on, at ~2/(w+1) the storage of the full k-gram set.
    *
    * Output: `(id, pos, fp)` — 0-based gram position and 32-bit gram
    * hash of each selected fingerprint, one distinct row each.
    *
    * Scale shape: one explode to (doc, pos, hash), ONE doc-keyed
    * window pass with a bounded ROWS frame (`w - 1` following), one
    * distinct — no joins, nothing quadratic. The (hash,
    * rightmost-pos) argmin packs into a single BIGINT
    * (`hash·2²⁰ + (2²⁰−1 − pos)`) so the frame aggregate is a plain
    * MIN — portable integer arithmetic, no struct-ordering semantics.
    * Documents with fewer than `w` grams select from their one short
    * window; documents under `k` tokens contribute nothing (strict
    * gram semantics). Positions are capped at 2²⁰ grams per document
    * — split longer documents before fingerprinting.
    */
  def winnowing(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val grams = docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(Dedup.shingleArray(col("__toks"), k, strict = true))
          .as(Seq("pos0", "__sh")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos0"))
    val packed = grams
      .withColumn("__x", Sampling.hexPrefixValue(md5(col("__sh"))))
      .withColumn("__c",
        col("__x") * lit(1048576L) + (lit(1048575L) - col("pos0")))
      .withColumn("__nh", count(lit(1)).over(win.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__mc", min(col("__c")).over(win.rowsBetween(0, w - 1)))
    packed
      .filter(col("pos0") <= greatest(col("__nh") - w, lit(0)))
      .select(col(idCol),
        (lit(1048575L) - (col("__mc") % 1048576L)).as("pos"),
        (col("__mc") / 1048576L).cast("long").as("fp"))
      .distinct()
  }

  /** ANSI-SQL twin of [[winnowing]] over `src` (doc_id, textCol). */
  def winnowingSql(src: String, textCol: String, k: Int, w: Int): String = {
    val parts = (0 until k).map(j => s"wt[i+$j]").mkString(", ")
    s"""wt0 AS (SELECT doc_id, ${tokensSql(textCol)} AS wt FROM $src),
       |wg AS (SELECT doc_id, i - 1 AS pos0, concat_ws(' ', $parts) AS sh
       |       FROM wt0, unnest(generate_series(1, len(wt) - ${k - 1})) AS u(i)
       |       WHERE len(wt) >= $k),
       |wh AS (SELECT doc_id, pos0,
       |         (${graft.operators.Sampling.hexPrefixSql("md5(sh)")}) AS x FROM wg),
       |wc AS (SELECT doc_id, pos0, x * 1048576 + (1048575 - pos0) AS cc,
       |         COUNT(*) OVER (PARTITION BY doc_id) AS nh FROM wh),
       |wm AS (SELECT doc_id, pos0, nh,
       |         MIN(cc) OVER (PARTITION BY doc_id ORDER BY pos0
       |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mc
       |       FROM wc),
       |ws AS (SELECT DISTINCT doc_id,
       |         CAST(1048575 - (mc % 1048576) AS BIGINT) AS pos,
       |         CAST(mc // 1048576 AS BIGINT) AS fp
       |       FROM wm WHERE pos0 <= greatest(nh - $w, 0))""".stripMargin
  }

  /** Cross-source vocabulary overlap from KMV (k-minimum-values)
    * sketches (Beyer et al., SIGMOD'07), error-checked against the
    * exact n-gram Jaccard on the same corpus — [[vocabOverlap]]'s
    * sketch twin, and the shape that SURVIVES when the per-source
    * vocabularies stop fitting anywhere: each source reduces to its k
    * smallest 32-bit gram hashes (a mergeable, fixed-size summary; a
    * union of sketches is the sketch of the union), so the pairwise
    * comparison runs on `|sources| · k` rows however large the corpus
    * — the exact path's `(source, term)` self-join carries the whole
    * vocabulary instead.
    *
    * Estimators on the merged pair sketch (the k smallest of the
    * union, `nU = min(k, |union sketch|)` rows): Jaccard ≈ ρ/nU where
    * ρ counts members present in BOTH source sketches, and distinct
    * union ≈ `(nU−1)·2³² / h_(nU)` from the largest kept hash. All
    * integer inputs (hash ranks, ρ, nU) — the only doubles are the
    * final rounded ratios, so the DuckDB oracle matches exactly.
    *
    * Output per source pair `g1 < g2`:
    * `(g1, g2, kmv_jaccard, exact_jaccard, jaccard_abs_err,
    * est_union, exact_union)`.
    */
  def vocabOverlapKmv(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 64): DataFrame = {
    require(k >= 2, "a KMV sketch needs k >= 2")
    val terms = docs
      .select(col(groupCol).as("g"), Dedup.tokens(col(textCol)).as("__toks"))
      .select(col("g"),
        explode(Dedup.shingleArray(col("__toks"), n, strict = true)).as("term"))
      .distinct()
    val gh = terms
      .select(col("g"), Sampling.hexPrefixValue(md5(col("term"))).as("h"))
      .distinct()
    // k smallest hashes per source via the KMV aggregate
    // ([[graft.functions.KmvSketch]]): every map task reduces its
    // partition to <= k longs BEFORE the shuffle, so the exchange
    // carries one bounded sketch per (task, source) instead of the
    // per-source hash rows a top-k operator would still move
    val sk = gh.groupBy(col("g"))
      .agg(graft.functions.KmvSketch.kmvHashes(col("h"), k).as("__arr"))
      .select(col("g"), explode(col("__arr")).as("h"))

    val groups = gh.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("g1"))
      .crossJoin(groups.select(col("g").as("g2")))
      .filter(col("g1") < col("g2"))
    val pa = pairs.join(sk.select(col("g").as("g1"), col("h")), "g1")
      .select(col("g1"), col("g2"), col("h"),
        lit(1L).as("inA"), lit(0L).as("inB"))
    val pb = pairs.join(sk.select(col("g").as("g2"), col("h")), "g2")
      .select(col("g1"), col("g2"), col("h"),
        lit(0L).as("inA"), lit(1L).as("inB"))
    val merged = pa.unionByName(pb)
      .groupBy(col("g1"), col("g2"), col("h"))
      .agg(max(col("inA")).as("inA"), max(col("inB")).as("inB"))
    val w = Window.partitionBy(col("g1"), col("g2")).orderBy(col("h"))
    val kept = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    val est = kept.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("__nu"), max(col("h")).as("__kth"),
        sum(col("inA") * col("inB")).as("__rho"))

    val sizes = terms.groupBy(col("g")).agg(count(lit(1)).as("nv"))
    val inter = terms.as("a").join(terms.as("b"),
        col("a.term") === col("b.term") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("__ni"))
    val exact = inter
      .join(sizes.withColumnsRenamed(Map("g" -> "g1", "nv" -> "__v1")), "g1")
      .join(sizes.withColumnsRenamed(Map("g" -> "g2", "nv" -> "__v2")), "g2")
      .select(col("g1"), col("g2"),
        round(col("__ni").cast("double") /
          (col("__v1") + col("__v2") - col("__ni")), 6).as("exact_jaccard"),
        (col("__v1") + col("__v2") - col("__ni")).as("exact_union"))

    est.join(exact, Seq("g1", "g2"))
      .select(col("g1"), col("g2"),
        round(col("__rho").cast("double") / col("__nu"), 6).as("kmv_jaccard"),
        col("exact_jaccard"),
        col("__rho"), col("__nu"), col("__kth"), col("exact_union"))
      .select(col("g1"), col("g2"), col("kmv_jaccard"), col("exact_jaccard"),
        round(abs(col("kmv_jaccard") - col("exact_jaccard")), 6)
          .as("jaccard_abs_err"),
        // KMV rule (same branch as q148 and the streaming twin): an
        // UNSATURATED merged sketch (< k hashes) saw every distinct
        // hash of the union, so its size IS the exact count — the
        // (nU-1)*2^32/h_(nU) estimator only applies at saturation
        round(when(col("__nu") < k, col("__nu").cast("double"))
          .otherwise((col("__nu") - 1).cast("double") * lit(4294967296.0) /
            col("__kth")), 6).as("est_union"),
        col("exact_union"))
      .orderBy(col("g1"), col("g2"))
  }

  /** DuckDB SQL equivalent of [[vocabOverlapKmv]]. */
  def vocabOverlapKmvSql(
      src: String, groupCol: String, textCol: String, n: Int, k: Int): String = {
    val parts = (0 until n).map(j => s"wt[i+$j]").mkString(", ")
    s"""WITH wt0 AS (SELECT $groupCol AS g, ${tokensSql(textCol)} AS wt FROM $src),
       |tv AS (SELECT DISTINCT g, concat_ws(' ', $parts) AS term
       |       FROM wt0, unnest(generate_series(1, len(wt) - ${n - 1})) AS u(i)
       |       WHERE len(wt) >= $n),
       |gh AS (SELECT DISTINCT g,
       |         (${graft.operators.Sampling.hexPrefixSql("md5(term)")}) AS h FROM tv),
       |sk AS (SELECT g, h FROM (
       |  SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn FROM gh)
       |  WHERE rn <= $k),
       |gp AS (SELECT a.g AS g1, b.g AS g2
       |       FROM (SELECT DISTINCT g FROM gh) a, (SELECT DISTINCT g FROM gh) b
       |       WHERE a.g < b.g),
       |mg AS (SELECT g1, g2, h, MAX(inA) AS inA, MAX(inB) AS inB FROM (
       |  SELECT gp.g1, gp.g2, s.h, 1 AS inA, 0 AS inB FROM gp JOIN sk s ON s.g = gp.g1
       |  UNION ALL
       |  SELECT gp.g1, gp.g2, s.h, 0, 1 FROM gp JOIN sk s ON s.g = gp.g2)
       |  GROUP BY 1, 2, 3),
       |kept AS (SELECT * FROM (
       |  SELECT g1, g2, h, inA, inB,
       |    ROW_NUMBER() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn FROM mg)
       |  WHERE rn <= $k),
       |est AS (SELECT g1, g2, COUNT(*) AS nu, MAX(h) AS kth,
       |          CAST(SUM(inA * inB) AS BIGINT) AS rho
       |        FROM kept GROUP BY 1, 2),
       |sz AS (SELECT g, COUNT(*) AS nv FROM tv GROUP BY 1),
       |iv AS (SELECT a.g AS g1, b.g AS g2, COUNT(*) AS ni
       |       FROM tv a JOIN tv b ON a.term = b.term AND a.g < b.g GROUP BY 1, 2),
       |ex AS (SELECT g1, g2,
       |         round(CAST(ni AS DOUBLE) / (s1.nv + s2.nv - ni), 6) AS exact_jaccard,
       |         CAST(s1.nv + s2.nv - ni AS BIGINT) AS exact_union
       |       FROM iv JOIN sz s1 ON iv.g1 = s1.g JOIN sz s2 ON iv.g2 = s2.g),
       |fin AS (SELECT est.g1, est.g2,
       |          round(CAST(rho AS DOUBLE) / nu, 6) AS kmv_jaccard,
       |          ex.exact_jaccard,
       |          CAST(nu AS BIGINT) AS nu, kth, ex.exact_union
       |        FROM est JOIN ex ON est.g1 = ex.g1 AND est.g2 = ex.g2)
       |SELECT g1, g2, kmv_jaccard, exact_jaccard,
       |  round(abs(kmv_jaccard - exact_jaccard), 6) AS jaccard_abs_err,
       |  round(CASE WHEN nu < $k THEN CAST(nu AS DOUBLE)
       |        ELSE (nu - 1) * 4294967296.0 / kth END, 6) AS est_union,
       |  exact_union
       |FROM fin ORDER BY g1, g2""".stripMargin
  }
}
