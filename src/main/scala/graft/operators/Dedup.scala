package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for large-scale document pipelines.
  *
  * Four families:
  *
  *   - exact: keep one deterministic winner per key (hash shuffle on
  *     the key — one exchange, map-side partial aggregation).
  *   - MinHash + LSH: shingle -> k independent min-hashes -> band
  *     buckets -> candidate pairs. The only shuffles are per-doc
  *     (window + aggregate) and the band-bucket self-join; no
  *     all-pairs product is ever materialized — the 100 TB-safe
  *     near-dup path.
  *   - SimHash: sign-of-mean fingerprint, one groupBy.
  *   - n-gram Jaccard: exact similarity evaluated only on LSH
  *     candidate pairs, computed RELATIONALLY (shared-shingle counting
  *     join), so no per-document array ever has to fit in a row.
  *
  * Shingling materializes the token array in its own projection and
  * slices it per shingle — linear in document length and shuffle-free
  * (see [[shingleRows]]). Writing the same `transform` over the raw
  * tokenization expression in ONE projection would re-tokenize the
  * document per element (higher-order functions are interpreted, with
  * no common-subexpression elimination) and go quadratic.
  *
  * The per-shingle hash is md5 (hex string); a "min-hash" is the
  * lexicographic MIN of `md5(seed || ":" || shingle)` per seed. md5 is
  * a built-in in every engine, which keeps results reproducible and
  * oracle-checkable across systems.
  */
object Dedup {

  /** A lazy result plus the intermediates it persisted. Call
    * [[CachedDF.unpersist]] once the terminal action on `df` has run;
    * in a long-lived session the cached blocks otherwise stay pinned
    * until eviction pressure (Spark's CacheManager holds DataFrame
    * cache entries by plan, so they are never GC-reclaimed).
    */
  final case class CachedDF(
      df: DataFrame,
      handles: Seq[DataFrame],
      cleanups: Seq[() => Unit] = Nil) {
    def unpersist(): Unit = {
      handles.foreach(_.unpersist(false))
      cleanups.foreach(_.apply())
    }
  }

  /** Exact dedup: keep the row with the smallest `idCol` per key.
    * Deterministic, unlike `dropDuplicates` which keeps an arbitrary
    * row per key.
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Lowercased whitespace tokens, empties removed. Fine for per-row
    * scalar work; for shingling use [[shingleRows]] (see scaladoc).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct word n-gram shingles, one row per (doc, shingle).
    * Documents with fewer than `n` tokens (but at least one) contribute
    * a single whole-text shingle (`strict = false`) or nothing
    * (`strict = true` — the right semantics when shingles must be
    * comparable across documents, e.g. decontamination); empty
    * documents contribute none either way.
    *
    * Shuffle-free up to the final `distinct`: the token array is
    * materialized in its OWN projection, and the shingle lambda only
    * slices that bound array — O(n) per shingle. The two projections
    * must stay separate (CollapseProject leaves them alone because
    * `__toks` is non-cheap and referenced more than once); inlining the
    * tokenization into the lambda would re-tokenize the document per
    * element, the quadratic trap that also bites `transform` over a
    * derived array written in one projection.
    */
  /** The shingle ARRAY for a bound token-array column — the ONE
    * definition of shingle semantics, shared by the row-explode path
    * ([[shingleRows]]) and the per-row signature path
    * ([[rowMinhashSignatures]]) so the two formulations cannot drift
    * (StreamingDedup and the q128 oracle depend on their signatures
    * being byte-identical).
    */
  private[operators] def shingleArray(toks: Column, n: Int, strict: Boolean): Column = {
    val full = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    if (strict) full
    else full.when(size(toks) >= 1, array(array_join(toks, " ")))
  }

  def shingleRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      strict: Boolean = false): DataFrame = {
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    withToks
      .select(col(idCol), explode(shingleArray(col("__toks"), n, strict)).as("__sh"))
      .distinct()
  }

  /** Smallest prime above 2^32 — the modulus of the MinHash permutation
    * family. */
  val MinhashPrime: Long = 4294967311L

  /** Multiplier of permutation `i`: odd-ish, below 2^31 so `a * x`
    * (x < 2^32) stays inside a signed 64-bit long — no overflow in ANSI
    * mode, identical arithmetic in every engine. */
  def minhashA(i: Int): Long = ((2654435761L * (i + 1)) % 2147483629L) + 1L

  /** Offset of permutation `i`, below [[MinhashPrime]]. */
  def minhashB(i: Int): Long = (1779033703L * (i + 1)) % MinhashPrime

  /** MinHash signatures from shingle rows: one row per document with
    * BIGINT columns `sig0..sig{k-1}`, where
    * `sigI = min((aI * x % P + bI) % P)` over the document's shingles
    * and `x` is the first 8 hex digits of `md5(shingle)` as an integer.
    *
    * ONE md5 per shingle; the k permutations are affine maps over the
    * 32-bit hash — the standard MinHash construction, and ~k times
    * cheaper than hashing every shingle k times (at corpus scale the
    * shingle hashing IS the pipeline's dominant cost). All integer
    * arithmetic, so any engine reproduces the signatures exactly.
    * One groupBy(doc) — shuffle payload is k longs per doc.
    */
  def minhashFromShingles(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val p = lit(MinhashPrime)
    val aggs = (0 until k).map { i =>
      min(((lit(minhashA(i)) * col("__x")) % p + lit(minhashB(i))) % p).as(s"sig$i")
    }
    sh.withColumn("__mh", md5(col("__sh")))
      .withColumn("__x", Sampling.hexPrefixValue("__mh"))
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      shingleSize: Int = 3): DataFrame =
    minhashFromShingles(shingleRows(docs, idCol, textCol, shingleSize), idCol, k)

  /** Per-ROW MinHash signatures: the same sig0..sig{k-1} columns as
    * [[minhashSignatures]], computed with array expressions only — no
    * explode, no groupBy. `array_min` over the shingle array replaces
    * the per-shingle-row `min` aggregate; duplicates in the raw
    * shingle array don't move a min, so the values are IDENTICAL to
    * the aggregate path's (asserted in StreamingSpec).
    *
    * This is the formulation a STREAMING pipeline needs: a stateless
    * per-row projection keeps the signature step out of streaming
    * state entirely (the aggregate formulation would demand a
    * watermarked stateful agg just to assemble one document's
    * signature). Batch callers should prefer [[minhashSignatures]],
    * whose shingle rows feed the rest of the LSH pipeline.
    *
    * `conv(hex, 16, 10)` supplies the 32-bit shingle hash here (Spark-
    * only code path); the aggregate path uses the locate-trick
    * [[Sampling.hexPrefixValue]] because its value must also be
    * reproducible in the DuckDB oracle — both compute the integer
    * value of the first 8 md5 hex digits, so signatures agree.
    *
    * Documents with no tokens yield no row (null shingle array
    * filtered), matching the aggregate path.
    */
  def rowMinhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      shingleSize: Int = 3): DataFrame = {
    val p = lit(MinhashPrime)
    val n = shingleSize
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val shingles = shingleArray(col("__toks"), n, strict = false)
    // ONE md5 per shingle, materialized as the __xs hash array in its
    // own projection; the k signatures are array_mins of affine maps
    // over it. Folding the md5 into each sig column would hash every
    // shingle k times — the exact cost minhashFromShingles documents
    // as the pipeline's dominant one.
    val xs = transform(col("__shs"),
      sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"))
    val sigCols = (0 until k).map { i =>
      array_min(transform(col("__xs"),
        x => ((lit(minhashA(i)) * x) % p + lit(minhashB(i))) % p)).as(s"sig$i")
    }
    withToks.withColumn("__shs", shingles)
      .filter(col("__shs").isNotNull)
      .withColumn("__xs", xs)
      .select(col(idCol) +: sigCols: _*)
  }

  /** Explode signatures into (id, band, bucket) rows; `bucket` is the
    * concatenation of the band's `k / bands` signature values.
    */
  def lshBuckets(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        // ':'-separated — integer signatures are variable-width, so a
        // bare concat would let (1,12) collide with (11,2)
        concat_ws(":",
          (b * r until (b + 1) * r).map(i => col(s"sig$i").cast("string")): _*).as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.bucket").as("bucket"))
  }

  /** Default hot-bucket cap for [[lshCandidatePairs]]. The DuckDB
    * oracle twin (`SparkEntry.sigsCte`) interpolates THIS constant into
    * its SQL so the capped semantics cannot drift between the engine
    * and the oracle — change it here and both sides move together.
    */
  val DefaultMaxPerBucket: Int = 64

  /** Candidate near-duplicate pairs (id1 < id2) sharing at least one
    * LSH band bucket. The self-join keys on (band, bucket), so only
    * rows in the same bucket ever meet; a bucket with more than
    * `maxPerBucket` members (boilerplate that hashes everything
    * together — empty pages, license headers) switches from all-vs-all
    * to star edges against the bucket's minimum id, keeping the pair
    * output linear in bucket size.
    *
    * What the cap preserves, precisely: connected components of the
    * RAW candidate graph are unchanged (every member still reaches the
    * bucket min through a star edge). Components of the VERIFIED graph
    * are not guaranteed: a downstream verifier (e.g.
    * [[jaccardNearDupPairs]]'s exact-Jaccard filter) sees only the
    * star edges inside a hot bucket, and (min, X) and (min, Y) can
    * both fail the similarity threshold while the suppressed pair
    * (X, Y) would have passed — genuinely-similar documents in a hot
    * bucket may then land in separate clusters (under-merge) relative
    * to uncapped semantics. That recall loss inside degenerate
    * boilerplate buckets is the deliberate trade for linear output —
    * the same trade the streaming twin makes
    * ([[graft.streaming.StreamingDedup]]); pass
    * `maxPerBucket = Int.MaxValue` to recover exhaustive listing when
    * a corpus is known to have no degenerate buckets. The signature
    * table is persisted: it is tiny (k hashes/doc) and both join sides
    * read it, which would otherwise recompute the whole shingle+hash
    * pipeline twice.
    */
  def lshCandidatePairs(
      sigs: DataFrame,
      idCol: String,
      k: Int,
      bands: Int,
      maxPerBucket: Int = DefaultMaxPerBucket): DataFrame =
    lshCandidatePairsCached(sigs, idCol, k, bands, maxPerBucket).df

  /** [[lshCandidatePairs]] plus the persisted signature table, so a
    * long-lived caller can release it after its action (one-shot jobs
    * can use the plain variant — the JVM exit releases everything).
    */
  def lshCandidatePairsCached(
      sigs: DataFrame,
      idCol: String,
      k: Int,
      bands: Int,
      maxPerBucket: Int = DefaultMaxPerBucket): CachedDF = {
    require(maxPerBucket > 1, "maxPerBucket must allow at least one pair")
    val s = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    // Per-bucket size + min id in ONE shuffle (window over the same
    // (band, bucket) key the self-join uses), persisted because three
    // consumers read it (small-bucket self-join ×2, hot-bucket stars).
    // m·(m−1)/2 pairs only below the cap; a hot bucket of m members
    // emits m−1 star edges instead of up to 10^12 pairs for a
    // 10^6-member boilerplate bucket.
    val w = Window.partitionBy(col("band"), col("bucket"))
    val bs = lshBuckets(s, idCol, k, bands)
      .withColumn("__m", count(lit(1)).over(w))
      .withColumn("__minid", min(col(idCol)).over(w))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val small = bs.filter(col("__m") <= maxPerBucket)
    val smallPairs = small.select(col("band"), col("bucket"), col(idCol).as("d1"))
      .join(small.select(col("band"), col("bucket"), col(idCol).as("d2")),
        Seq("band", "bucket"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
    // __minid is the bucket minimum, so __minid < id holds for every
    // non-min member — the d1 < d2 invariant comes for free.
    val hotPairs = bs
      .filter(col("__m") > maxPerBucket && col(idCol) > col("__minid"))
      .select(col("__minid").as("d1"), col(idCol).as("d2"))
    val pairs = smallPairs.union(hotPairs).distinct()
    CachedDF(pairs, Seq(s, bs))
  }

  /** Exact n-gram Jaccard similarity on LSH candidate pairs only.
    * Returns (d1, d2, jaccard) for pairs with similarity >= threshold.
    *
    * |A∩B| comes from a shared-shingle counting join and |A∪B| from
    * |A| + |B| - |A∩B| — no arrays, so this works for arbitrarily
    * large documents and candidate sets.
    */
  def jaccardNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxPerBucket: Int = DefaultMaxPerBucket): DataFrame =
    jaccardNearDupPairsCached(docs, idCol, textCol, k, bands, shingleSize,
      threshold, maxPerBucket).df

  /** Per-document n-gram novelty: the fraction of a document's
    * distinct shingles that appear NOWHERE else in the corpus — the
    * inverse of near-dup density, and the cheap "is this document new
    * information" signal a dedup pipeline reports alongside its pair
    * lists. Two partial-aggregated shuffles (per-shingle corpus counts,
    * per-doc rollup); no pairs ever materialize. Returns
    * (id, n_sh, n_uniq, novelty).
    */
  def shingleNovelty(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val cnt = sh.groupBy(col("__sh")).agg(count(lit(1)).as("__c"))
    sh.join(cnt, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_uniq"))
      .select(col(idCol), col("n_sh"), col("n_uniq"),
        round(col("n_uniq").cast("double") / col("n_sh"), 6).as("novelty"))
      .orderBy(idCol)
  }

  /** [[jaccardNearDupPairs]] plus its persisted intermediates (shingle
    * and signature tables) for caller-managed release.
    */
  def jaccardNearDupPairsCached(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxPerBucket: Int = DefaultMaxPerBucket): CachedDF =
    jaccardNearDupPairsWithSigs(docs, idCol, textCol, k, bands, shingleSize,
      threshold, maxPerBucket)._1

  /** The near-dup pipeline's named intermediates: verified pairs plus
    * the persisted shingle and signature frames they were derived
    * from. The point of naming them is REUSE — a curation pipeline
    * ([[DocPipeline.curate]]) consumes `pairs` for clustering,
    * `shingles` again for n-gram decontamination, and releases
    * everything once, instead of re-running the shingle+hash pipeline
    * per consumer (the dominant cost at corpus scale).
    */
  final case class NearDupArtifacts(
      pairs: DataFrame,
      shingles: DataFrame,
      sigs: DataFrame,
      handles: Seq[DataFrame]) {
    def unpersist(): Unit = handles.foreach(_.unpersist(false))
  }

  /** [[jaccardNearDupPairsCached]] plus the persisted signature frame
    * the pairs were LSH-blocked with — for consumers that need both
    * (e.g. the sketch-accuracy check) without paying the dominant
    * shingle+hash pipeline twice.
    */
  def jaccardNearDupPairsWithSigs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxPerBucket: Int = DefaultMaxPerBucket): (CachedDF, DataFrame) = {
    val a = nearDupArtifacts(docs, idCol, textCol, k, bands, shingleSize,
      threshold, maxPerBucket)
    (CachedDF(a.pairs, a.handles), a.sigs)
  }

  /** [[jaccardNearDupPairsWithSigs]] with every persisted intermediate
    * returned BY NAME, so multi-consumer pipelines can reuse the
    * shingle table (decontamination) and signature table (sketch
    * checks) the pair generation already paid for.
    */
  def nearDupArtifacts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxPerBucket: Int = DefaultMaxPerBucket): NearDupArtifacts = {
    val sh = shingleRows(docs, idCol, textCol, shingleSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    nearDupArtifactsFromSigs(sh, minhashFromShingles(sh, idCol, k), idCol,
      bands, threshold, maxPerBucket)
  }

  /** [[nearDupArtifacts]] starting from PRECOMPUTED per-doc inputs:
    * the shingle rows and minhash signatures of the SAME document
    * set. Shingling + k hash-min aggregations are the dominant cost
    * of the near-dup pipeline, and both are per-document properties —
    * independent of which other documents are in the set — so a
    * pipeline family whose members differ only in an upstream
    * per-document gate (e.g. [[DocPipeline.curate]] with and without
    * a model filter) computes them ONCE over the superset, stores
    * them, and each member calls this with its semi-filtered slice.
    * Banding, bucket caps and the verify join run here per call, on
    * exactly the filtered set, so results are identical to running
    * [[nearDupArtifacts]] on that set directly (asserted in
    * CurateSpec).
    *
    * `sh` must already be persisted or be a cheap re-read (a stored
    * parquet table): it feeds both the verify join and, via the
    * returned artifacts, downstream consumers.
    */
  def nearDupArtifactsFromSigs(
      sh: DataFrame,
      sigs: DataFrame,
      idCol: String,
      bands: Int = 3,
      threshold: Double = 0.5,
      maxPerBucket: Int = DefaultMaxPerBucket): NearDupArtifacts = {
    val k = sigs.columns.count(_.matches("sig\\d+"))
    val candCached =
      lshCandidatePairsCached(sigs, idCol, k, bands, maxPerBucket)
    // LSH prunes hard: candidate docs are a small fraction of the
    // corpus, so everything downstream should touch only them. Persist
    // the pair list (it feeds three consumers), semi-filter the (huge)
    // shingle table down to candidate docs, and compute sizes and
    // intersections on the filtered remnant. No broadcast hints: AQE
    // converts these joins to broadcast at runtime when the candidate
    // set is actually small, and degrades gracefully to shuffle joins
    // on a pathological corpus where it is not.
    val cand = candCached.df.persist(StorageLevel.MEMORY_AND_DISK)
    val candDocs = cand.select(col("d1").as(idCol))
      .union(cand.select(col("d2")))
      .distinct()
    val shc = sh.join(candDocs, Seq(idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = shc.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val a = shc.select(col(idCol).as("d1"), col("__sh"))
    val b = shc.select(col(idCol).as("d2"), col("__sh"))
    val inter = cand
      .join(a, "d1")
      .join(b, Seq("d2", "__sh"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("__inter"))
    val pairs = cand
      .join(inter, Seq("d1", "d2"), "left")
      .na.fill(0L, Seq("__inter"))
      .join(sizes.select(col(idCol).as("d1"), col("__n").as("__na")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("__n").as("__nb")), "d2")
      .withColumn("jaccard",
        col("__inter") / (col("__na") + col("__nb") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
    // candCached.handles.head IS the persisted signature frame
    NearDupArtifacts(pairs, sh, candCached.handles.head,
      Seq(sh, cand, shc) ++ candCached.handles)
  }

  /** Connected components over near-duplicate pairs: every document
    * gets the MINIMUM id reachable through the pair graph as its
    * `cluster_id` (singletons cluster with themselves). This is the
    * step after pair generation that decides which documents are "the
    * same": keep one representative per cluster, drop the rest.
    *
    * `pairs` must have columns `d1` and `d2` (the schema
    * [[jaccardNearDupPairs]] and [[lshCandidatePairs]] emit).
    *
    * Iterative min-label propagation. Per round every node takes the
    * min of its own label and its neighbors' labels — shuffle cost is
    * |edges| per round, rounds ~ graph diameter (near-dup clusters are
    * tiny and dense, so 3-5 rounds in practice). Labels persist
    * between rounds and the loop stops at fixpoint, detected with a
    * count of changed labels; a component whose diameter exceeds
    * `maxIter` raises IllegalStateException rather than silently
    * splitting one real cluster into several. This is the standard
    * scalable formulation — no driver-side graph, no assumption a
    * component fits anywhere.
    *
    * One-shot convenience over [[dupClustersCached]] — long-lived
    * sessions should use that and release the handle after their
    * action.
    */
  def dupClusters(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      maxIter: Int = 20): DataFrame =
    dupClustersCached(docs, pairs, idCol, maxIter).df

  /** [[dupClusters]] plus the final persisted label generation for
    * caller-managed release.
    */
  /** Edge-count bound for the driver union-find fast path of
    * [[dupClustersCached]]. Same philosophy as a broadcast-join
    * threshold: below it, the edge list provably fits on the driver
    * (2 longs x 1M rows ~ tens of MB) and a local union-find replaces
    * ~10 distributed actions; above it, the scalable label-propagation
    * path runs unchanged.
    */
  val SmallGraphEdges: Int = 1 << 20

  def dupClustersCached(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      maxIter: Int = 20,
      smallGraphEdges: Int = SmallGraphEdges): CachedDF = {
    val idType = docs.schema(idCol).dataType
    val integralId = idType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (integralId && smallGraphEdges > 0) {
      // near-dup pair lists are tiny relative to the corpus (the
      // duplicate rate, not the table size): probe with limit+collect —
      // one bounded evaluation of the pair pipeline — and finish on the
      // driver when it fits
      val probe = pairs
        .select(col("d1").cast("long"), col("d2").cast("long"))
        .limit(smallGraphEdges + 1).collect()
      if (probe.length <= smallGraphEdges) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        val endpoints = scala.collection.mutable.LinkedHashSet.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        probe.foreach { row =>
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            endpoints += row.getLong(0)
            endpoints += row.getLong(1)
            val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
            // attach the larger root under the smaller: every root IS
            // the component minimum, no second pass needed
            if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
          }
        }
        // mirror the distributed construction EXACTLY — one labeled row
        // per distinct edge endpoint (even one absent from docs), plus
        // every docs row not an endpoint as a self-labeled singleton —
        // so crossing the size threshold never changes the result
        val labels = endpoints.toSeq.map(k => (k, find(k)))
        val spark = docs.sparkSession
        import spark.implicits._
        val labelDf = labels.toDF("__a", "__lbl")
          .select(col("__a").cast(idType).as("__a"),
            col("__lbl").cast(idType).as("__lbl"))
        val singletons = docs.select(col(idCol).as("__a"))
          .join(broadcast(labelDf.select("__a")), Seq("__a"), "left_anti")
        val clusters = labelDf
          .select(col("__a"), col("__lbl"))
          .unionByName(singletons.select(col("__a"), col("__a").as("__lbl")))
          .select(col("__a").as(idCol), col("__lbl").as("cluster_id"))
        return CachedDF(clusters, Nil)
      }
      // fell through: graph too big for the driver — run the
      // distributed path below (the probe's partial evaluation is the
      // price of the check, bounded by the threshold)
    }
    // checkpoint the edge list BEFORE iterating: it embeds the whole
    // pair-generation pipeline, and that subtree would otherwise be
    // re-optimized several times per iteration plan — with tiny data
    // the driver-side Catalyst work dominates wall time (the same
    // reason GraphX/GraphFrames checkpoint inside iterative jobs). A
    // reliable checkpoint dir is honored when configured; local
    // checkpoint otherwise. One explode emits both edge directions —
    // a self-union would evaluate the whole un-persisted pair pipeline
    // twice during the eager checkpoint.
    val edgesRaw = pairs
      .select(explode(array(
        struct(col("d1").as("__a"), col("d2").as("__b")),
        struct(col("d2").as("__a"), col("d1").as("__b")))).as("__e"))
      .select(col("__e.__a").as("__a"), col("__e.__b").as("__b"))
    val edges =
      if (docs.sparkSession.sparkContext.getCheckpointDir.isDefined)
        edgesRaw.checkpoint()
      else edgesRaw.localCheckpoint()
    // only edge endpoints can ever change label: propagate over them
    // alone (a vanishing fraction of the corpus) and attach the
    // untouched documents as self-labeled singletons lazily at the end
    var persistedGen = edges.select(col("__a")).distinct()
      .select(col("__a"), col("__a").as("__lbl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = persistedGen
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborLbls = edges
        .join(labels.select(col("__a").as("__b"), col("__lbl")), "__b")
        .select(col("__a"), col("__lbl"), lit(false).as("__self"))
      // one aggregation yields the new label AND the old one (the
      // __self-tagged contribution), so convergence needs no extra join
      val next = labels
        .select(col("__a"), col("__lbl"), lit(true).as("__self"))
        .union(neighborLbls)
        .groupBy("__a")
        .agg(
          min(col("__lbl")).as("__lbl"),
          min(when(col("__self"), col("__lbl"))).as("__old"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("__lbl") =!= col("__old")).count()
      // unpersist the PERSISTED frame — unpersisting a projection of it
      // would be a no-op and leak a cache entry per iteration
      persistedGen.unpersist(false)
      persistedGen = next
      labels = next.select(col("__a"), col("__lbl"))
      i += 1
      if (sys.env.contains("GRAFT_DEBUG"))
        System.err.println(s"[dupClusters] iter $i changed=$changed")
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIter rounds ($changed labels " +
          "still changing) — a component's diameter exceeds maxIter; raise it")
    val singletons = docs.select(col(idCol).as("__a"))
      .join(edges.select("__a").distinct(), Seq("__a"), "left_anti")
      .select(col("__a"), col("__a").as("__lbl"))
    val clusters = labels.union(singletons)
      .select(col("__a").as(idCol), col("__lbl").as("cluster_id"))
    // release the checkpointed edges with the handle: localCheckpoint
    // pins RDD blocks on executors for the session lifetime and
    // Dataset.unpersist can't see them (they are not CacheManager
    // entries) — graftbridge.unpersistCheckpointed frees the underlying
    // RDD's blocks. A reliable checkpoint's FILES are reclaimed by
    // ContextCleaner (spark.cleaner.referenceTracking.cleanCheckpoints)
    // or manual checkpoint-dir cleanup, not here.
    CachedDF(clusters, Seq(persistedGen),
      Seq(() => graftbridge.unpersistCheckpointed(edges)))
  }

  /** SimHash-style fingerprint over md5 hex digits.
    *
    * Each token hashes to 16 hex digits; dimension j of a document is
    * the mean of digit j across its tokens, and bit j of the
    * fingerprint is 1 iff that mean >= 7.5 (the sign-of-mean test of
    * classic SimHash, over 16 4-bit dimensions). Near-identical token
    * multisets produce identical fingerprints. One groupBy(doc).
    */
  /** Incremental-ingest near-dup check: which INCOMING documents are
    * within `maxHamming` SimHash bits of an already-ingested BASE
    * document. The daily-batch shape of dedup — the base corpus is
    * indexed once, each new batch probes it — instead of the all-pairs
    * [[jaccardNearDupPairs]] shape.
    *
    * Blocking is the classic Hamming-LSH pigeonhole: split the 16-bit
    * fingerprint into 4 bands of 4 bits; any pair within Hamming
    * distance 3 (< number of bands) agrees EXACTLY on at least one
    * band, so the band equi-join is lossless for `maxHamming <= 3` —
    * never a cross join, candidates only from shared-band buckets.
    * Returns (new_id, old_id, hamming), one row per qualifying pair.
    */
  def simhashIncrementalPairs(
      base: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashIncrementalPairsFromSigs(
      simhash16(base, idCol, textCol),
      simhash16(incoming, idCol, textCol), idCol, maxHamming, sigChars = 16)

  /** [[simhashIncrementalPairs]] over PRECOMPUTED `(idCol, simhash)`
    * frames — the shape an incremental curation run needs: the base
    * side's fingerprints are persisted state from a prior run, so the
    * base corpus text is never re-scanned. Null signatures (docs with
    * no tokens) are dropped from both sides.
    *
    * `sigChars` is the fingerprint width (16 for [[simhash16]], 64 for
    * [[simhash64]]); blocking is always 4 bands of `sigChars / 4`
    * bits, lossless for `maxHamming <= 3` by the pigeonhole. The
    * WIDTH, not the band count, decides scale: per band a 16-bit
    * fingerprint has only 2^4 buckets — on a corpus of n docs the
    * band join meets ~n^2/16 candidate rows per band, quasi-quadratic
    * once n >> 16 — while 64 bits give 2^16 buckets per band and a
    * corpus must exceed ~65k near-identical docs per bucket before
    * the same degradation starts. 64 is therefore the default; pass
    * `sigChars = 16` explicitly only for legacy [[simhash16]] state
    * tables written before the width migration.
    *
    * A signature whose length differs from `sigChars` would otherwise
    * fail SILENTLY — `conv` of a short substring yields NULL words,
    * NULL hamming, and the filter drops every pair — so each side
    * raises per-row on a width mismatch instead.
    */
  def simhashIncrementalPairsFromSigs(
      baseSigs: DataFrame,
      incomingSigs: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      sigChars: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band blocking is only lossless for maxHamming <= 3, got $maxHamming")
    require(sigChars % 4 == 0, s"sigChars must be divisible by 4, got $sigChars")
    val chunk = sigChars / 4
    def widthChecked(sig: Column): Column =
      when(sig.isNull || length(sig) === sigChars, sig).otherwise(raise_error(concat(
        lit(s"simhash width mismatch: expected $sigChars chars, got "),
        length(sig).cast("string"), lit(" — wrong sigChars for this state table?"))))
    // The bit-string signature is decoded ONCE per side into 32-bit
    // integer words (and integer band chunks): the band join then
    // shuffles 8-byte longs instead of 64-char strings, and Hamming
    // distance is `bit_count(xor)` per word — two codegen-friendly
    // integer ops — instead of a 64-term substring-comparison
    // expression tree (which blew past codegen limits and ran
    // interpreted: measured 16 s for 400k candidate rows at sf0.1,
    // vs <1 s with bit_count). The Hamming filter runs BEFORE the
    // pair distinct, so only qualifying pairs (not every multi-band
    // candidate, strings in tow) pay the dedup shuffle.
    val nWords = (sigChars + 31) / 32
    def words(sig: Column, prefix: String): Seq[Column] =
      (0 until nWords).map { i =>
        val len = math.min(32, sigChars - 32 * i)
        conv(substring(sig, 1 + 32 * i, len), 2, 10).cast("long").as(s"$prefix$i")
      }
    def bands(sig: Column): Column =
      array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          conv(substring(sig, 1 + chunk * i, chunk), 2, 10).cast("long").as("chunk"))): _*)
    val b = baseSigs
      .select(col(idCol).as("old_id"), widthChecked(col("simhash")).as("__sb"))
      .filter(col("__sb").isNotNull)
      .select(col("old_id") +: words(col("__sb"), "__wb") :+
        explode(bands(col("__sb"))).as("__b"): _*)
    val n = incomingSigs
      .select(col(idCol).as("new_id"), widthChecked(col("simhash")).as("__sn"))
      .filter(col("__sn").isNotNull)
      .select(col("new_id") +: words(col("__sn"), "__wn") :+
        explode(bands(col("__sn"))).as("__b"): _*)
    val hamming = (0 until nWords).map(i =>
      bit_count(col(s"__wb$i").bitwiseXOR(col(s"__wn$i"))).cast("long")).reduce(_ + _)
    n.join(b, "__b")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("new_id"), col("old_id"), col("hamming"))
      .distinct()
  }

  /** Cross-modal near-dup in ONE banded join: input frames carry
    * `(modalityCol, idCol, simhash)` rows for EVERY modality — text
    * [[simhash64]], image grid hashes, audio energy hashes, video
    * majority hashes all share the 64-char bit-string convention — and
    * the pigeonhole equi-key is `(modality, band, chunk)`, so pairs
    * form only within a modality while the whole multimodal corpus
    * moves through a single shuffle instead of one join job per
    * modality. Same integer decode / `bit_count` Hamming / width
    * guard as [[simhashIncrementalPairsFromSigs]]; returns
    * `(modality, new_id, old_id, hamming)`.
    */
  def crossModalNearDupPairs(
      baseSigs: DataFrame,
      incomingSigs: DataFrame,
      idCol: String,
      modalityCol: String,
      maxHamming: Int = 3,
      sigChars: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band blocking is only lossless for maxHamming <= 3, got $maxHamming")
    require(sigChars % 4 == 0, s"sigChars must be divisible by 4, got $sigChars")
    val chunk = sigChars / 4
    def widthChecked(sig: Column): Column =
      when(sig.isNull || length(sig) === sigChars, sig).otherwise(raise_error(concat(
        lit(s"simhash width mismatch: expected $sigChars chars, got "),
        length(sig).cast("string"))))
    val nWords = (sigChars + 31) / 32
    def words(sig: Column, prefix: String): Seq[Column] =
      (0 until nWords).map { i =>
        val len = math.min(32, sigChars - 32 * i)
        conv(substring(sig, 1 + 32 * i, len), 2, 10).cast("long").as(s"$prefix$i")
      }
    def bands(sig: Column): Column =
      array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          conv(substring(sig, 1 + chunk * i, chunk), 2, 10).cast("long").as("chunk"))): _*)
    val b = baseSigs
      .select(col(modalityCol).as("modality"), col(idCol).as("old_id"),
        widthChecked(col("simhash")).as("__sb"))
      .filter(col("__sb").isNotNull)
      .select(col("modality") +: col("old_id") +: words(col("__sb"), "__wb") :+
        explode(bands(col("__sb"))).as("__b"): _*)
    val n = incomingSigs
      .select(col(modalityCol).as("modality"), col(idCol).as("new_id"),
        widthChecked(col("simhash")).as("__sn"))
      .filter(col("__sn").isNotNull)
      .select(col("modality") +: col("new_id") +: words(col("__sn"), "__wn") :+
        explode(bands(col("__sn"))).as("__b"): _*)
    val hamming = (0 until nWords).map(i =>
      bit_count(col(s"__wb$i").bitwiseXOR(col(s"__wn$i"))).cast("long")).reduce(_ + _)
    n.join(b, Seq("modality", "__b"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("modality"), col("new_id"), col("old_id"), col("hamming"))
      .distinct()
  }

  /** Segment-level (CCNet-style paragraph) dedup: split each document
    * into consecutive NON-overlapping `segTokens`-token segments, call
    * a segment boilerplate when it occurs in more than `maxDf` distinct
    * documents, drop boilerplate occurrences everywhere, and rebuild
    * each document from its surviving segments in order. This is the
    * sub-document twin of exact dedup: headers, navigation text and
    * license blocks repeat across documents that are NOT near-dups as
    * wholes, so document-level passes never see them.
    *
    * Output: (id, n_seg, n_kept, kept_fp) where kept_fp is the md5 of
    * the rebuilt text ("" when every segment was boilerplate) — the
    * fingerprint a downstream exact-dedup pass would key on.
    *
    * Scale shape (the part that must survive 100 TB):
    *   - segmenting is a pure projection + explode (no shuffle);
    *     segments are keyed by md5 so the wide segment text never
    *     shuffles for counting;
    *   - the df-count is one partial-aggregated groupBy on the 32-char
    *     hash;
    *   - only the BOILERPLATE subset (df > maxDf — vastly smaller than
    *     the distinct-segment universe) joins back, as a left join
    *     whose null-match IS the kept flag, so AQE can broadcast it;
    *   - the rebuild groups a document's OWN segments (bounded by the
    *     document's size, same as the input row) — `array_sort` on
    *     (i, seg, kept) structs restores order without a window.
    */
  def segmentDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int = 8,
      maxDf: Int = 1): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    require(maxDf >= 1, "maxDf must be >= 1")
    // materialize the token array ONCE per document — inlining the
    // split into the transform lambda would re-tokenize the document
    // per segment (the quadratic trap shingleRows documents)
    val segs = docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), expr(
        s"""explode(transform(
           |  sequence(0, cast(ceil(size(__toks) / $segTokens.0D) as int) - 1),
           |  i -> struct(
           |    cast(i as bigint) as i,
           |    array_join(slice(__toks, i * $segTokens + 1, $segTokens), ' ') as seg)))
           |""".stripMargin).as("__s"))
      .select(col(idCol), col("__s.i").as("i"), col("__s.seg").as("seg"))
    val boiler = segs
      .groupBy(md5(col("seg")).as("__h"))
      .agg(countDistinct(col(idCol)).as("__ndocs"))
      .filter(col("__ndocs") > maxDf)
      .select(col("__h"))
    segs
      .join(boiler, md5(col("seg")) === boiler("__h"), "left")
      .withColumn("kept", col("__h").isNull)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_seg"),
        sum(col("kept").cast("long")).as("n_kept"),
        md5(expr(
          "array_join(transform(filter(array_sort(collect_list(struct(i, seg, kept))), " +
            "x -> x.kept), x -> x.seg), ' ')")).as("kept_fp"))
  }

  def simhash16(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val dims = (0 until 16).map { j =>
      avg(expr(s"locate(substring(h, ${j + 1}, 1), '0123456789abcdef') - 1"))
        .as(s"__d$j")
    }
    val agged = toks.groupBy(col(idCol)).agg(dims.head, dims.tail: _*)
    val bits = (0 until 16).map(j =>
      when(col(s"__d$j") >= 7.5, lit("1")).otherwise(lit("0")))
    agged.select(col(idCol), concat(bits: _*).as("simhash"))
  }

  /** 64-bit SimHash — the CORPUS-SCALE fingerprint. [[simhash16]] is
    * the compact reference-parity shape, but 16 bits saturate on any
    * real corpus: per 4-bit band there are only 16 buckets, so the
    * blocked incremental join degrades toward n^2/16 candidates
    * (measured: at 5000 synthetic docs, hamming <= 3 on 16 bits
    * matches ~99% of all cross pairs; on 64 bits it matches 4 pairs
    * with a median inter-doc distance of 20 bits). Classic SimHash
    * (Charikar 2002 / Manku et al. 2007 use 64 bits for web-scale
    * dedup) — here dimension `j` is bit `j%4` of md5 hex digit
    * `j/4 + 1`, averaged over the document's tokens; fingerprint bit =
    * 1 iff that mean >= 0.5 (sign-of-mean). One explode + one groupBy
    * with 64 partial-aggregated avgs; md5 keeps the oracle
    * reproducible in any engine.
    */
  def simhash64(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val dims = (0 until 64).map { j =>
      avg(expr(
        s"((locate(substring(h, ${j / 4 + 1}, 1), '0123456789abcdef') - 1) " +
          s"div ${1 << (j % 4)}) % 2")).as(s"__d$j")
    }
    val agged = toks.groupBy(col(idCol)).agg(dims.head, dims.tail: _*)
    val bits = (0 until 64).map(j =>
      when(col(s"__d$j") >= 0.5, lit("1")).otherwise(lit("0")))
    agged.select(col(idCol), concat(bits: _*).as("simhash"))
  }

  /** [[simhashIncrementalPairs]] on the 64-bit fingerprint: 4 bands of
    * 16 bits = 65536 buckets per band, the blocking that stays linear
    * on corpora where the 16-bit variant's band join goes quadratic.
    */
  def simhash64IncrementalPairs(
      base: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashIncrementalPairsFromSigs(
      simhash64(base, idCol, textCol),
      simhash64(incoming, idCol, textCol), idCol, maxHamming, sigChars = 64)

  /** Maximal cross-document repeated token spans — the substring-level
    * exact-dedup primitive (the pattern of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, which removes repeated substrings rather than
    * whole near-dup documents; reference scope: mydatasyncer has no
    * text operators — this is extension surface).
    *
    * A `window`-token sliding hash is computed at EVERY token offset
    * (overlapping, unlike [[segmentDedup]]'s disjoint tiles), window
    * hashes that occur in >= 2 distinct documents are kept, and each
    * document's hit offsets are merged into maximal spans: two hits
    * belong to one span when their offsets differ by at most `window`
    * (overlapping windows share tokens; exactly-adjacent windows abut
    * into one contiguous duplicated region). Output: one row per
    * (document, span) with the 0-based token offset, the span's token
    * length, and how many duplicated windows support it.
    *
    * Scale shape: window hashing happens inside the scan projection
    * (array `transform` over the one materialized token array — no
    * shuffle, ~one md5 per token, same order of work as shingling).
    * Then exactly three shuffles, none carrying text: the duplicated-
    * window groupBy (partial-aggregated, key = 32-char hash), the
    * hit semi-join (AQE broadcasts the dup side when small), and the
    * per-document island merge (payload = (doc, pos) longs). The span
    * merge is two window functions over each document's hits — spills,
    * never buffers a whole document's text.
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8): DataFrame = {
    require(window > 0, "window must be positive")
    val wins = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= window)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(__toks) - $window), " +
          s"i -> struct(cast(i as bigint) as pos, " +
          s"md5(array_join(slice(__toks, i + 1, $window), ' ')) as h))")).as("__w"))
      .select(col(idCol), col("__w.pos").as("pos"), col("__w.h").as("h"))
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("h"))
    val hits = wins.join(dup, "h").select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      // first row per doc: lag is NULL, the comparison is NULL, the
      // otherwise-branch fires -> starts island 1 (same in the SQL twin)
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= window, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__isl", sum(col("__new"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(window.toLong)).as("span_tokens"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_tokens"), col("n_windows"))
  }

  /** The dedup ACTION for clustered near-duplicates: keep the
    * highest-quality document of each cluster, drop the rest. Takes
    * the [[dupClusters]] output plus any per-id quality signal (token
    * count, a model score, recency) and reports, per non-singleton
    * cluster, the kept id, its quality, and how many members were
    * dropped — the table a curation job joins against to materialize
    * the deduplicated corpus.
    *
    * Ties break on the lower id, so reruns and backfills keep the SAME
    * representative (a nondeterministic winner would churn the corpus
    * between identical runs). One join and one cluster-keyed window
    * whose partitions are cluster-sized — bounded by the duplicate
    * rate, not the corpus.
    */
  def clusterRepresentatives(
      clusters: DataFrame,
      quality: DataFrame,
      idCol: String,
      qualityCol: String): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(qualityCol).desc, col(idCol))
    clusters.join(quality, idCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("__rn") === 1 && col("n_docs") > 1)
      .select(col("cluster_id"), col("n_docs"),
        col(idCol).as("kept_doc"), col(qualityCol).as("kept_quality"),
        (col("n_docs") - 1).as("n_dropped"))
  }

  /** Edit-distance-verified near-duplicates: exact Levenshtein
    * confirmation of the MinHash-LSH candidate pairs — the final
    * verification stage of a dedup pipeline, where the cheap
    * probabilistic blocker proposes and an exact character-level
    * measure disposes.
    *
    * Levenshtein is O(len^2) PER PAIR, so it must never see the
    * all-pairs product; here it runs only on band-blocked LSH
    * candidates (the 100 TB-safe shape), and each side is capped at
    * `maxChars` characters so one pathological document pair cannot
    * dominate a task. Spark's built-in `levenshtein(l, r, threshold)`
    * additionally abandons the DP early once the running distance
    * exceeds `maxDist` (banded DP: O(len * maxDist)) and returns -1,
    * which the output filter drops.
    *
    * Shuffles: the LSH pipeline's own (per-doc aggregate + bucket
    * self-join), plus two id-keyed joins to fetch the capped texts.
    * The distance itself is a codegen'd projection.
    */
  def editDistanceNearDup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      maxChars: Int = 400,
      maxDist: Int = 80): DataFrame = {
    require(maxChars > 0 && maxDist >= 0, "maxChars/maxDist out of range")
    val sigs = minhashSignatures(docs, idCol, textCol, k)
    val t = docs.select(col(idCol), substring(col(textCol), 1, maxChars).as("__t"))
    lshCandidatePairs(sigs, idCol, k, bands)
      .join(t.select(col(idCol).as("d1"), col("__t").as("__t1")), "d1")
      .join(t.select(col(idCol).as("d2"), col("__t").as("__t2")), "d2")
      .select(col("d1"), col("d2"),
        levenshtein(col("__t1"), col("__t2"), maxDist).cast("long").as("edit_dist"),
        length(col("__t1")).cast("long").as("len1"),
        length(col("__t2")).cast("long").as("len2"))
      .filter(col("edit_dist").between(0, maxDist))
  }

  /** DuckDB SQL twin of [[repeatedSpans]] over table `src`. */
  def repeatedSpansSql(
      src: String,
      idCol: String,
      textCol: String,
      window: Int = 8): String =
    s"""WITH t AS (
       |  SELECT $idCol, ${graft.operators.TextAnalysis.tokensSql(textCol)} AS a FROM $src),
       |w0 AS (
       |  SELECT $idCol, a, unnest(range(len(a) - $window + 1)) AS i
       |  FROM t WHERE len(a) >= $window),
       |w AS (
       |  SELECT $idCol, CAST(i AS BIGINT) AS pos,
       |         md5(array_to_string(a[i + 1 : i + $window], ' ')) AS h
       |  FROM w0),
       |dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT $idCol) >= 2),
       |hit AS (SELECT $idCol, pos FROM w JOIN dup USING (h)),
       |isl0 AS (
       |  SELECT $idCol, pos,
       |         CASE WHEN pos - LAG(pos) OVER (PARTITION BY $idCol ORDER BY pos)
       |                   <= $window THEN 0 ELSE 1 END AS nw
       |  FROM hit),
       |isl AS (
       |  SELECT $idCol, pos,
       |         SUM(nw) OVER (PARTITION BY $idCol ORDER BY pos
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM isl0)
       |SELECT $idCol, MIN(pos) AS span_start,
       |       MAX(pos) - MIN(pos) + $window AS span_tokens,
       |       COUNT(*) AS n_windows
       |FROM isl GROUP BY $idCol, g
       |ORDER BY $idCol, span_start""".stripMargin

  /** Truncation duplicates: pairs `(a, b)` where document `a`'s full
    * text is a STRICT character prefix of document `b`'s (`len(a) <
    * len(b)`). The common corpus pathology this catches is re-crawled /
    * re-ingested documents cut at different byte limits — exact dedup
    * (same hash) misses them, and near-dup passes see them only when
    * the truncation is small.
    *
    * Shape: a prefix relation implies the first `blockChars` characters
    * agree, so the main path is an equi self-join on that fixed-width
    * block key (hash join, AQE-skewed if a boilerplate prefix is hot),
    * verified by one `substr` comparison — never an all-pairs product.
    * Documents shorter than `blockChars` can't carry the block key of a
    * longer continuation, so they take a separate pass: broadcast the
    * (by construction tiny: shorter than the block) short side against
    * the corpus with the direct prefix predicate.
    *
    * Output: `(a_id, b_id, a_len, b_len)`.
    */
  def prefixDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockChars: Int = 16): DataFrame = {
    val d = docs.select(
      col(idCol).as("__id"), col(textCol).as("__t"),
      length(col(textCol)).cast("long").as("__len"))
    def side(p: String, df: DataFrame) = df.select(
      col("__id").as(s"${p}_id"), col("__t").as(s"${p}_t"),
      col("__len").as(s"${p}_len"))
    val long = d.filter(col("__len") >= blockChars)
    val isPrefix =
      col("a_len") < col("b_len") &&
        col("b_t").substr(lit(1), col("a_len")) === col("a_t")
    val main = side("a", long).withColumn("__blk", substring(col("a_t"), 1, blockChars))
      .join(side("b", long).withColumn("__blk", substring(col("b_t"), 1, blockChars)),
        Seq("__blk"))
      .filter(isPrefix)
    val shortSide = broadcast(side("a", d.filter(col("__len") < blockChars)))
      .join(side("b", d), isPrefix)
    main.select("a_id", "b_id", "a_len", "b_len")
      .unionByName(shortSide.select("a_id", "b_id", "a_len", "b_len"))
  }

  /** Blocker-ensemble near-duplicate detection: candidates from THREE
    * independent blocking geometries — MinHash-LSH band buckets
    * (set-similarity), 16-bit SimHash pigeonhole bands (Hamming), and
    * sorted-neighborhood rank bands (order-proximity) — unioned with
    * per-blocker provenance, then verified ONCE with the exact
    * shingle-set Jaccard.
    *
    * Output: `(d1, d2, jaccard, by_lsh, by_simhash, by_snm)` for
    * verified pairs (`jaccard >= threshold`, `d1 < d2`) — the recall
    * audit table: which geometry surfaced which verified pair. No
    * single blocker is complete (LSH misses below its similarity
    * S-curve, SimHash past its Hamming radius, SNM across bucket
    * boundaries); the union's recall is what a production dedup
    * actually runs, and the provenance columns quantify each
    * geometry's marginal contribution on a real corpus.
    *
    * Scale: each blocker is its existing bounded pipeline (LSH
    * hot-bucket cap, lossless 4-band pigeonhole, exactly-`window`
    * SNM candidates per doc via the (bucket, rank-band) equi-key —
    * see [[Linkage.sortedNeighborhoodNearDup]]); the union dedups on
    * (d1, d2) with a `bit_or` mask; verification joins the candidate
    * set — not the corpus square — against the shared shingle table.
    * ONE tokenization+shingle pass feeds both the MinHash signatures
    * (LSH leg) and the exact-Jaccard verify: the shingle table is
    * persisted and read by both, instead of re-running the dominant
    * corpus-scan+md5 pipeline twice. The verified-pair frame (tiny:
    * only qualifying pairs) is persisted and MATERIALIZED before the
    * dominant shingle table is unpersisted — so a JVM running several
    * ensemble consumers ([[ensembleRecallReport]], a bench) never
    * accumulates shingle copies, and callers manage only the small
    * pair persist through the returned [[CachedDF]].
    */
  def ensembleNearDupCached(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      maxHamming: Int = 3,
      snmBucketLen: Int = 4,
      snmSortLen: Int = 40,
      snmWindow: Int = 5,
      threshold: Double = 0.5): CachedDF = {
    val sh = shingleRows(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // 64-bit SimHash is the corpus-scale fingerprint here: the 16-bit
    // variant's 16-bucket bands saturate at a few thousand docs and
    // its pigeonhole join goes quasi-quadratic (measured 135 s at
    // sf0.1 inside this ensemble; see PLANS "SimHash width")
    val out = ensembleNearDupFromSigsCached(docs, sh,
      minhashFromShingles(sh, idCol, k), simhash64(docs, idCol, textCol),
      idCol, textCol, bands, maxHamming, snmBucketLen, snmSortLen,
      snmWindow, threshold)
    sh.unpersist(false) // FromSigs materialized the verified frame
    out
  }

  /** [[ensembleNearDupCached]] from PRECOMPUTED per-document inputs:
    * the shingle rows, MinHash signatures and 64-bit SimHash
    * fingerprints of the SAME document set (e.g.
    * [[DocPipeline.CurationArtifacts]]' stored tables) — every
    * blocker's per-document reduction is read, not recomputed, and
    * the call pays only the banding/pigeonhole/rank joins plus the
    * exact-Jaccard verification. `sh` must be persisted or a cheap
    * re-read (a stored parquet table): it feeds both the size count
    * and the intersection join.
    */
  def ensembleNearDupFromSigsCached(
      docs: DataFrame,
      sh: DataFrame,
      sigs: DataFrame,
      sigs64: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 3,
      maxHamming: Int = 3,
      snmBucketLen: Int = 4,
      snmSortLen: Int = 40,
      snmWindow: Int = 5,
      threshold: Double = 0.5): CachedDF = {
    val k = sigs.columns.count(_.matches("sig\\d+"))
    val lshC = lshCandidatePairs(sigs, idCol, k, bands)
      .select(col("d1"), col("d2")).distinct()
      .withColumn("__src", lit(1))
    val shC = simhashIncrementalPairsFromSigs(sigs64, sigs64, idCol,
        maxHamming, sigChars = 64)
      .filter(col("old_id") < col("new_id"))
      .select(col("old_id").as("d1"), col("new_id").as("d2")).distinct()
      .withColumn("__src", lit(2))
    val norm = lower(col(textCol))
    val ranked = docs.select(col(idCol),
        substring(norm, 1, snmBucketLen).as("__bk"),
        substring(norm, 1, snmSortLen).as("__sk"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__bk")).orderBy(col("__sk"), col(idCol))))
    // (bucket, rank-band) equi-key: O(window) candidates per doc under
    // any bucket skew (see Linkage.sortedNeighborhoodNearDup)
    val snmBand = floor((col("__rn") - 1) / snmWindow).cast("long")
    val snmC = ranked.select(col("__bk"), col("__rn").as("__ra"),
        col(idCol).as("__ida"), snmBand.as("__ba"))
      .withColumn("__band", explode(array(col("__ba"), col("__ba") + 1)))
      .join(ranked.select(col("__bk"), col("__rn").as("__rb"),
          col(idCol).as("__idb"), snmBand.as("__band")),
        Seq("__bk", "__band"))
      .filter(col("__rb") > col("__ra") && col("__rb") <= col("__ra") + snmWindow)
      .select(least(col("__ida"), col("__idb")).as("d1"),
        greatest(col("__ida"), col("__idb")).as("d2"))
      .distinct()
      .withColumn("__src", lit(4))
    val cand = lshC.unionByName(shC).unionByName(snmC)
      .groupBy(col("d1"), col("d2"))
      .agg(expr("bit_or(__src)").as("__mask"))

    val cnt = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val shared = cand.select(col("d1"), col("d2"))
      .join(sh.select(col(idCol).as("d1"), col("__sh")), "d1")
      .join(sh.select(col(idCol).as("d2"), col("__sh")), Seq("d2", "__sh"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("__s"))
    val verified = cand.join(shared, Seq("d1", "d2"))
      .join(cnt.select(col(idCol).as("d1"), col("__n").as("__n1")), "d1")
      .join(cnt.select(col(idCol).as("d2"), col("__n").as("__n2")), "d2")
      .withColumn("jaccard", round(
        col("__s").cast("double") / (col("__n1") + col("__n2") - col("__s")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"),
        (col("__mask").bitwiseAND(lit(1)) > 0).as("by_lsh"),
        (col("__mask").bitwiseAND(lit(2)) > 0).as("by_simhash"),
        (col("__mask").bitwiseAND(lit(4)) > 0).as("by_snm"))
      .orderBy("d1", "d2")
      .persist(StorageLevel.MEMORY_AND_DISK)
    verified.count() // materialize so any caller-held shingle persist can go now
    CachedDF(verified, Seq(verified))
  }

  /** One-shot [[ensembleNearDupCached]]: the dominant shingle persist
    * is released eagerly inside the cached variant; only the tiny
    * verified-pair persist lives until JVM exit. Long-lived sessions
    * should hold the [[CachedDF]] and release it after their action.
    */
  def ensembleNearDup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      maxHamming: Int = 3,
      snmBucketLen: Int = 4,
      snmSortLen: Int = 40,
      snmWindow: Int = 5,
      threshold: Double = 0.5): DataFrame =
    ensembleNearDupCached(docs, idCol, textCol, k, bands, maxHamming,
      snmBucketLen, snmSortLen, snmWindow, threshold).df

  /** The blocker-recall audit [[ensembleNearDup]]'s provenance mask
    * exists for, as data: verified-pair counts per provenance
    * combination, with each combination's share of the verified set —
    * `(by_lsh, by_simhash, by_snm, n_pairs, share)`. Reading it:
    * a geometry whose exclusive rows (`true` only there) are empty is
    * redundant ON THIS CORPUS and can be dropped from the production
    * ensemble; a geometry carrying a large exclusive share is load-
    * bearing. That turns the 100 TB blocker choice into a measurement
    * instead of a guess.
    *
    * The aggregate runs on the verified pair set (already bounded);
    * the output is at most 7 rows, so the share window's single
    * partition is safe by construction.
    */
  def ensembleRecallReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      maxHamming: Int = 3,
      snmBucketLen: Int = 4,
      snmSortLen: Int = 40,
      snmWindow: Int = 5,
      threshold: Double = 0.5): DataFrame =
    ensembleRecallFromPairs(
      ensembleNearDup(docs, idCol, textCol, k, bands, maxHamming,
        snmBucketLen, snmSortLen, snmWindow, threshold))

  /** [[ensembleRecallReport]] over a PRECOMPUTED verified-pair frame
    * (the [[ensembleNearDup]] output schema) — so one ensemble
    * computation can feed both the pair listing and the recall audit
    * without paying the 3-blocker pipeline twice in the same JVM.
    */
  def ensembleRecallFromPairs(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("by_lsh"), col("by_simhash"), col("by_snm"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("share", round(
        col("n_pairs").cast("double") /
          sum(col("n_pairs")).over(Window.partitionBy()), 6))
      .orderBy(col("by_lsh"), col("by_simhash"), col("by_snm"))
}
