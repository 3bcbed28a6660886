package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over embedding columns (`array<float>`).
  *
  * The math is composed from `zip_with`/`aggregate` higher-order
  * functions — sequential left folds, so accumulation order is
  * deterministic and reproducible across engines. Floats are widened to
  * double before any arithmetic.
  *
  * Two search paths:
  *   - [[bruteForceTopK]]: exact top-k for a bounded query set. The
  *     query side broadcasts, the corpus streams — no shuffle of the
  *     corpus, scales to any corpus size (cost = |Q| x |corpus| dots).
  *   - [[signBucketNearDupPairs]]: LSH-style blocking on the sign
  *     pattern of the leading dimensions; only within-bucket pairs are
  *     scored. This is the scale path for all-pairs style near-dup
  *     detection (an IVF-like partition of the space).
  */
object Similarity {

  /** Cast an array<float> column to array<double>. */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Sequential-fold dot product — a codegen'd Catalyst expression (see
    * [[graft.functions.ArrayDotProduct]]; the `aggregate(zip_with(...))`
    * formulation runs interpreted and dominates pairwise joins).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest
    * `corpus` rows (self-matches by id excluded). Output:
    * (qid, rank 1..k, nbr, sim).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(
        col(idCol).as("qid"),
        toDoubleArray(col(vecCol)).as("__qv"))
        .withColumn("__qn", l2Norm(col("__qv"))))
    val c = corpus.select(
      col(idCol).as("nbr"),
      toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv")))
    val scored = q.join(c, col("qid") =!= col("nbr"))
      .withColumn("sim", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"))
  }

  /** IVF-style ANN: partition the corpus into cells around centroid
    * vectors, then search a query only in its `nProbe` nearest cells.
    * This is the scale path for top-k search — per query the work drops
    * from |corpus| dots to |centroids| + |probed cells| dots, and cell
    * assignment is one broadcast pass over the corpus.
    *
    * Centroids here are the `nCells` lowest-id corpus vectors —
    * deterministic and engine-portable; production would plug in k-means
    * centroids (the assignment/probe machinery is identical).
    * Approximate by design: a true neighbor in an unprobed cell is
    * missed; raise `nProbe` for recall.
    *
    * Output: (qid, rank 1..k, nbr, sim).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 2): DataFrame = {
    val cents = broadcast(
      corpus.filter(col(idCol) < nCells).select(
        col(idCol).as("__cid"),
        toDoubleArray(col(vecCol)).as("__cv"))
        .withColumn("__cn", l2Norm(col("__cv"))))

    def assign(df: DataFrame, outId: String, vecOut: String, normOut: String,
        probes: Int): DataFrame = {
      val e = df.select(col(idCol).as(outId), toDoubleArray(col(vecCol)).as(vecOut))
        .withColumn(normOut, l2Norm(col(vecOut)))
      val w = Window.partitionBy(outId)
        .orderBy(col("__csim").desc, col("__cid"))
      e.join(cents)
        .withColumn("__csim",
          dot(col(vecOut), col("__cv")) / (col(normOut) * col("__cn")))
        .withColumn("__crn", row_number().over(w))
        .filter(col("__crn") <= probes)
        .select(col(outId), col(vecOut), col(normOut), col("__cid").as("__cell"))
    }

    val corpusCells = assign(corpus, "nbr", "__cv2", "__cn2", probes = 1)
    val queryCells = assign(queries, "qid", "__qv", "__qn", probes = nProbe)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr"))
    queryCells.join(corpusCells, Seq("__cell"))
      .filter(col("qid") =!= col("nbr"))
      .withColumn("sim", dot(col("__qv"), col("__cv2")) / (col("__qn") * col("__cn2")))
      // a (query, neighbor) pair can meet in several probed cells
      .select(col("qid"), col("nbr"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"))
  }

  /** Bucket key: the sign pattern of the first `dims` vector elements,
    * e.g. "1010". Deterministic on raw float signs — no hashing, no
    * platform variance.
    */
  def signBucket(vec: Column, dims: Int): Column =
    concat((1 to dims).map(i =>
      when(element_at(vec, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Near-duplicate vector pairs (id1 < id2) with cosine >= threshold,
    * blocked by [[signBucket]] so only same-bucket pairs are scored.
    * Approximate by design (a near-dup pair straddling a sign flip on a
    * leading dim is missed) — that is the documented LSH recall
    * trade-off; raise recall by lowering `bucketDims`.
    */
  def signBucketNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bucketDims: Int = 4,
      threshold: Double = 0.4): DataFrame = {
    val e = df.select(col(idCol), toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__bucket", signBucket(col("__v"), bucketDims))
      .withColumn("__n", l2Norm(col("__v")))
    val a = e.select(col("__bucket"), col(idCol).as("d1"),
      col("__v").as("__v1"), col("__n").as("__n1"))
    val b = e.select(col("__bucket"), col(idCol).as("d2"),
      col("__v").as("__v2"), col("__n").as("__n2"))
    a.join(b, Seq("__bucket"))
      .filter(col("d1") < col("d2"))
      .withColumn("sim", dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2")))
      .filter(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
  }
}
