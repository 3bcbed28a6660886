package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lexical (sparse bag-of-words) similarity at corpus scale: all-pairs
  * cosine over n-gram frequency vectors, and weighted-Jaccard
  * verification of blocked candidate pairs.
  *
  * The reference engine (yoRyuuuuu/mydatasyncer) has no similarity
  * layer at all — these are Spark-first designs following the
  * all-pairs-similarity-search literature (Bayardo, Ma & Srikant,
  * WWW'07 "Scaling Up All Pairs Similarity Search"): the quadratic
  * candidate space is never materialized; pairs are generated through
  * an inverted-index self-join whose per-term fan-out is bounded by a
  * document-frequency cut.
  *
  * Why the df-cut is THE scale guard here: a term appearing in `df`
  * documents contributes `df·(df−1)/2` pairs to the index self-join.
  * Near-ubiquitous terms (df ≈ N) alone would make the join output
  * quadratic in the corpus. Dropping terms with `df > maxDf` bounds
  * every term's fan-out to `maxDf²`, so total join output is at most
  * `maxDf · Σ df = maxDf · |postings|` — LINEAR in corpus size for a
  * fixed cut. It is also semantically right for near-duplicate
  * detection: ubiquitous terms carry no signal about which two
  * documents are related (the same reason BM25's idf sends their
  * weight toward 0). Terms with `df < 2` are pruned too — a hapax
  * can never witness a pair, and hapaxes dominate a natural
  * vocabulary (Zipf), so this halves the postings for free.
  *
  * Terms are STRICT token n-grams ([[Dedup.shingleArray]] semantics:
  * sub-width documents contribute nothing, so vectors are comparable
  * across documents), kept as a MULTISET — unlike the shingle-set
  * operators (q21-q23), repetition is preserved, because tf weighting
  * is the point of the cosine/weighted-Jaccard measures.
  *
  * Term identity stays the PLAIN STRING on purpose (measured, round
  * 11): packing terms to a 60-bit md5-prefix long made every
  * term-keyed shuffle/join key 8 bytes, but computing md5 PER TOKEN
  * OCCURRENCE (commons-codec allocates a MessageDigest per call)
  * cost more than the short-string join keys ever did — q140 warm at
  * sf0.1 measured 11.5s hashed vs 7.2-8.8s with strings, q139 tied.
  * Spark's join hashing of short UTF8Strings is already cheap; the
  * md5-as-identity convention pays off only where the hash is ALSO
  * the algorithm (MinHash/LSH), not as a pure key compression.
  *
  * Determinism (oracle-exactness): every aggregate that crosses a
  * shuffle is an exact BIGINT sum (tf products, squared norms,
  * min-overlaps) — never a floating sum whose partial order is
  * engine-dependent. Doubles appear only in the FINAL scalar
  * (`dot/√(n1·n2)`), computed from exact integers by correctly-rounded
  * IEEE ops, identically in Spark and the DuckDB oracle.
  */
object SparseSimilarity {

  /** (id, term, tf) occurrence counts of strict token `n`-grams
    * (`n = 1` → plain tokens): one explode + one partial-aggregated
    * (id, term) shuffle.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    tfFromToks(tokenArrays(docs, idCol, textCol), idCol, n)

  /** (id, __toks) token-array frame — the one tokenization pass both
    * term spaces of [[weightedJaccardNearDup]] derive from.
    */
  private def tokenArrays(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks"))

  private def tfFromToks(withToks: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1, "n-gram width must be >= 1")
    val terms =
      if (n == 1) withToks.select(col(idCol), explode(col("__toks")).as("term"))
      else withToks.select(col(idCol),
        explode(Dedup.shingleArray(col("__toks"), n, strict = true)).as("term"))
    terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
  }

  /** All document pairs whose `n`-gram tf-vector cosine (restricted to
    * terms with `2 <= df <= maxDf`) reaches `minCosine`:
    * `(d1, d2, dot, cosine)` with `d1 < d2`, `cosine` rounded to 6
    * decimals for cross-engine float identity.
    *
    * Shape: tf → df-cut → persisted postings read three ways (two
    * self-join sides + norms). The self-join keys on `term`, so only
    * documents sharing a retained term ever meet; the (d1, d2) groupBy
    * is partial-aggregated, so executors combine local tf-products
    * before the pair shuffle. Norms live in the SAME pruned vector
    * space as the dot — cosine is exactly 1.0 for documents with
    * identical pruned vectors, regardless of what the cut removed.
    */
  def allPairsCosine(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxDf: Int,
      minCosine: Double): DataFrame = {
    require(maxDf >= 2, "maxDf < 2 prunes every pair-witnessing term")
    val tf = tfFromToks(tokenArrays(docs, idCol, textCol), idCol, n)
    val dfq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf))
      .select("term")
    val kept = tf.join(dfq, "term").persist(StorageLevel.MEMORY_AND_DISK)
    val norms = kept.groupBy(col(idCol))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = kept.select(col("term"), col(idCol).as("d1"), col("tf").as("tf1"))
      .join(kept.select(col("term"), col(idCol).as("d2"), col("tf").as("tf2")), "term")
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(col("tf1") * col("tf2")).as("dot"))
    dots
      .join(norms.select(col(idCol).as("d1"), col("n2").as("__n1")), "d1")
      .join(norms.select(col(idCol).as("d2"), col("n2").as("__n2")), "d2")
      .withColumn("cosine", round(
        col("dot").cast("double") /
          sqrt(col("__n1").cast("double") * col("__n2").cast("double")), 6))
      .filter(col("cosine") >= minCosine)
      .select("d1", "d2", "dot", "cosine")
  }

  /** Weighted (multiset) token Jaccard near-duplicates:
    * `J_w(A,B) = Σ_t min(tfA, tfB) / Σ_t max(tfA, tfB)` over ALL
    * tokens, returned as `(d1, d2, overlap, wjaccard)` for pairs
    * reaching `threshold`, `d1 < d2`.
    *
    * Weighted Jaccard sees repetition that the shingle-SET Jaccard
    * (q23) is blind to — "spam spam spam" vs "spam" are identical as
    * sets but 1/3 under multiset semantics — exactly the
    * boilerplate-vs-content distinction a training-corpus dedup wants.
    *
    * Blocking: candidates are pairs sharing at least one `blockN`-gram
    * with `2 <= df <= maxDf` (the df-cut inverted index of
    * [[allPairsCosine]] — linear output). Verification then needs the
    * min-overlap over ALL shared tokens (any df), NOT just retained
    * n-grams — so the candidate set joins back against the full
    * unigram tf table, the standard block-then-verify shape
    * (candidates ≪ corpus²; tf rows only shuffle keyed on id/term).
    * The identity `Σ max = dl1 + dl2 − Σ min` (dl = total tokens)
    * turns the denominator into two per-doc scalars plus the computed
    * min-overlap — no outer join over term unions.
    */
  def weightedJaccardNearDup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockN: Int,
      maxDf: Int,
      threshold: Double): DataFrame = {
    require(maxDf >= 2, "maxDf < 2 prunes every pair-witnessing term")
    // one tokenization pass feeds BOTH term spaces (blockN-gram index
    // and unigram verify) — without the persist each derives its own
    // scan + split of the full corpus
    val toks = tokenArrays(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The blockN-gram tf is the pipeline's most expensive frame (one
    // explode+shuffle over every n-gram occurrence) and THREE plans
    // read it (the df cut and both self-join sides) — unpersisted it
    // re-runs per reader (measured 4 evaluations at 5-9 s each in the
    // stage audit; the persist collapses them to one).
    val block = tfFromToks(toks, idCol, blockN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfq = block.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxDf))
      .select("term")
    val keptIdx = block.join(dfq, "term")
    val cand = keptIdx.select(col("term"), col(idCol).as("d1"))
      .join(keptIdx.select(col("term"), col(idCol).as("d2")), "term")
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val tf = tfFromToks(toks, idCol, n = 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    // length prune (Bayardo's size filter): Σmin <= min(dl1, dl2) and
    // Σmax >= max(dl1, dl2), so J_w <= min(dl)/max(dl) — a pair whose
    // length ratio is under the threshold CANNOT pass verification.
    // Exact, so the oracle twin (which filters the unpruned pair set
    // by the same final threshold) is unaffected; it just keeps the
    // token-level verify join off provably-hopeless candidates.
    val sized = cand
      .join(dl.select(col(idCol).as("d1"), col("dl").as("__l1")), "d1")
      .join(dl.select(col(idCol).as("d2"), col("dl").as("__l2")), "d2")
      .filter(least(col("__l1"), col("__l2")).cast("double") >=
        greatest(col("__l1"), col("__l2")) * threshold)
    // Semi-filtering the tf sides to candidate ids first was tried
    // (round 16) and MEASURED SLOWER at every SF here: on a
    // template-heavy corpus the candidate set covers most documents,
    // so the two distinct+semi-join prunes cost more than the rows
    // they remove (q140 warm 10.8s with vs 7.2s without at sf0.1).
    // At production selectivity (candidates ≪ corpus) the prune wins —
    // re-introduce it behind a selectivity estimate if that regime
    // matters; exactness is unaffected either way.
    //
    // Round-17 stage audit (StageTime, warm runs 7.28s/7.35s at
    // sf0.1): the floor is INTRINSIC — the two verify stages are
    // CPU-bound at ~20s executor-CPU each (the pair-by-term join +
    // min/max aggregation over ~1.24M exploded rows) on top of a
    // 27-stage barrier chain; every shared frame is already persisted
    // and read once. No missing persist, no re-evaluation, no skewed
    // partition dominates. The ~7.3s warm / ~8s in-suite level is the
    // cost of exact multiset-Jaccard verification on this corpus
    // shape.
    // (d1, d2) determines (__l1, __l2), so the lengths ride through
    // the groupBy as extra keys (2 longs per pair) instead of two more
    // post-aggregation joins against dl.
    val overlap = sized
      .join(tf.select(col(idCol).as("d1"), col("term"), col("tf").as("tf1")), "d1")
      .join(tf.select(col(idCol).as("d2"), col("term"), col("tf").as("tf2")),
        Seq("d2", "term"))
      .groupBy(col("d1"), col("d2"), col("__l1"), col("__l2"))
      .agg(sum(least(col("tf1"), col("tf2"))).as("overlap"))
    overlap
      .withColumn("wjaccard", round(
        col("overlap").cast("double") /
          (col("__l1") + col("__l2") - col("overlap")).cast("double"), 6))
      .filter(col("wjaccard") >= threshold)
      .select("d1", "d2", "overlap", "wjaccard")
  }
}
