package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines.
  *
  * Four families, all pure DataFrame/built-in-function compositions (no
  * UDFs, codegen-friendly):
  *
  *   - exact: keep one deterministic winner per key (hash shuffle on
  *     the key — one exchange, map-side partial aggregation).
  *   - MinHash + LSH: shingle -> k independent min-hashes -> band
  *     buckets -> candidate pairs. The only shuffles are the signature
  *     groupBy and the band-bucket self-join; no all-pairs product is
  *     ever materialized, so this is the 100 TB-safe near-dup path.
  *   - SimHash: sign-of-mean fingerprint, one groupBy.
  *   - n-gram Jaccard: exact similarity, evaluated only on LSH
  *     candidate pairs (blocked), never all pairs.
  *
  * The per-token hash is md5 (hex string), and a "min-hash" is the
  * lexicographic MIN of `md5(seed || ":" || shingle)` per seed. md5 is
  * a built-in in every engine, which keeps results reproducible and
  * oracle-checkable across systems.
  */
object Dedup {

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

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct word n-gram shingles. Documents with fewer than `n`
    * tokens contribute a single whole-text shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(
        transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (1 to n).map(j => element_at(w, i + j)): _*))))
      .otherwise(array(concat_ws(" ", w)))
  }

  /** MinHash signatures: one row per document with columns
    * `sig0..sig{k-1}`, where `sigI = min(md5("I:" || shingle))`.
    * One explode + one groupBy(doc) — shuffle size is k hashes/doc.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(
      col(idCol),
      explode(shingles(col(textCol), shingleSize)).as("__sh"))
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("__sh")))).as(s"sig$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
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
        concat((b * r until (b + 1) * r).map(i => col(s"sig$i")): _*).as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.bucket").as("bucket"))
  }

  /** Candidate near-duplicate pairs (id1 < id2) sharing at least one
    * LSH band bucket. The self-join keys on (band, bucket), so only
    * rows in the same bucket ever meet — no quadratic blowup.
    */
  def lshCandidatePairs(
      sigs: DataFrame,
      idCol: String,
      k: Int,
      bands: Int): DataFrame = {
    val b = lshBuckets(sigs, idCol, k, bands)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("d1"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("d2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
      .distinct()
  }

  /** Exact n-gram Jaccard similarity on LSH candidate pairs only.
    * Returns (d1, d2, jaccard) for pairs with similarity >= threshold.
    */
  def jaccardNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k, shingleSize)
    val cand = lshCandidatePairs(sigs, idCol, k, bands)
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
    val a = sh.select(col(idCol).as("d1"), col("__sh").as("__sh1"))
    val b = sh.select(col(idCol).as("d2"), col("__sh").as("__sh2"))
    cand
      .join(a, "d1")
      .join(b, "d2")
      .withColumn("jaccard",
        size(array_intersect(col("__sh1"), col("__sh2"))).cast("double") /
          size(array_union(col("__sh1"), col("__sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** SimHash-style fingerprint over md5 hex digits.
    *
    * Each token hashes to 16 hex digits; dimension j of a document is
    * the mean of digit j across its tokens, and bit j of the
    * fingerprint is 1 iff that mean >= 7.5 (the sign-of-mean test of
    * classic SimHash, over 16 4-bit dimensions). Near-identical token
    * multisets produce identical fingerprints. One groupBy(doc).
    */
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
}
