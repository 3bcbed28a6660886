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

  /** Distributed Lloyd k-means over an embedding column (requires an
    * integral id), with every arithmetic step chosen for cross-engine
    * determinism:
    *
    *   - init: the `k` lowest-id vectors (same convention as
    *     [[ivfTopK]]'s cells — deterministic, no RNG);
    *   - assignment: the centroids live on the driver (k x dims
    *     doubles — tiny) and enter the plan as LITERAL arrays, so
    *     nearest-centroid is a pure projection — no join, no window,
    *     no exchange of the corpus at any point;
    *   - update: dimension-wise mean as EXACT integer micro-units
    *     (round to 6 decimals -> x1e6 longs -> integer
    *     half-away-from-zero division; the same formulation as the
    *     oracle-checked centroid query), k x dims longs collected per
    *     iteration.
    *
    * A cluster that loses all members drops out (its centroid is not
    * re-emitted) — standard Lloyd behavior, mirrored by the SQL oracle
    * since GROUP BY produces the same surviving set. An empty initial
    * centroid set (no id below k) yields an empty result, matching the
    * oracle's empty cross join. Returns one row per input vector:
    * (id, cluster, sim-to-final-centroid), as a CachedDF whose handle
    * releases the checkpointed corpus blocks.
    */
  def kmeansAssignCached(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Dedup.CachedDF = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    // the corpus is re-scanned once per iteration: checkpoint so each
    // pass reads materialized rows, not the source pipeline
    val e = df.select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
      .localCheckpoint()

    // per row, the lexicographic array_min over (-sim, cid) structs
    // picks the highest similarity with ties to the lower centroid id,
    // exactly the ORDER BY sim DESC, cid convention of the SQL oracle;
    // a NaN similarity (zero-norm centroid) maps to -Infinity so it
    // still ranks FIRST, as NaN does under both engines' DESC ordering
    def assigned(cents: Seq[(Long, Array[Double])]): DataFrame = {
      val entries = cents.map { case (cid, v) =>
        // driver-side norm: same sequential left fold over the same
        // doubles as the engines' dot(v, v), so bit-identical
        val cn = math.sqrt(v.map(x => x * x).sum)
        val sim = dot(col("__v"), typedLit(v.toSeq)) / (col("__n") * lit(cn))
        // negsim orders; the raw sim rides along (3rd field — cid is
        // unique, so it never participates in the comparison) to keep
        // the output value NaN when the similarity is NaN
        struct(
          when(isnan(sim), lit(Double.NegativeInfinity))
            .otherwise(-sim).as("negsim"),
          lit(cid).as("cid"),
          sim.as("sim"))
      }
      e.withColumn("__best", array_min(array(entries: _*)))
        .select(col("__id"), col("__v"),
          col("__best.cid").as("__cid"),
          col("__best.sim").as("__csim"))
    }

    var cents: Seq[(Long, Array[Double])] = e.filter(col("__id") < k)
      .select(col("__id"), col("__v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    if (cents.isEmpty) {
      // no seed vectors below k: empty result (the oracle's empty
      // cross join), not an analysis error from a zero-entry array_min
      val empty = e.filter(lit(false))
        .select(col("__id").as(idCol),
          col("__id").cast("long").as("cluster"),
          col("__n").as("sim"))
      return Dedup.CachedDF(empty, Nil,
        Seq(() => org.apache.spark.sql.graftbridge.unpersistCheckpointed(e)))
    }
    for (_ <- 1 to iters) {
      // micro-unit exact centroid update (the q62 formulation)
      val micro = assigned(cents)
        .select(col("__cid"), posexplode(col("__v")).as(Seq("dim", "x")))
        .withColumn("__m", round(round(col("x"), 6) * 1e6).cast("long"))
        .groupBy(col("__cid"), col("dim"))
        .agg(sum(col("__m")).as("__s"), count(lit(1)).as("__cnt"))
        .select(col("__cid"), col("dim"),
          (when(col("__s") < 0, -1L).otherwise(1L) *
            expr("(2 * abs(__s) + __cnt) div (2 * __cnt)")).as("cm"))
        .collect()
      cents = micro
        .groupBy(_.getLong(0))
        .map { case (cid, rs) =>
          cid -> rs.sortBy(_.getInt(1))
            .map(_.getLong(2).toDouble / 1e6).toArray
        }
        .toSeq.sortBy(_._1)
    }
    val result = assigned(cents)
      .select(col("__id").as(idCol), col("__cid").as("cluster"),
        col("__csim").as("sim"))
    Dedup.CachedDF(result, Nil,
      Seq(() => org.apache.spark.sql.graftbridge.unpersistCheckpointed(e)))
  }

  /** One-shot convenience over [[kmeansAssignCached]]; the checkpointed
    * corpus blocks stay pinned for the session (Bench/Verify scrub
    * them; long-lived callers should use the cached variant).
    */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame =
    kmeansAssignCached(df, idCol, vecCol, k, iters).df

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

  /** Recall@k of an approximate neighbor result against exact ground
    * truth: per query, the fraction of the exact top-k the approximate
    * search found. The evaluation every ANN configuration needs before
    * it is trusted at corpus scale — run it on a sampled query set and
    * tune nCells/nProbe until recall clears the bar.
    *
    * Both inputs are (qidCol, nbrCol, ...) result frames (e.g.
    * [[bruteForceTopK]] and [[ivfTopK]]). One equi-join on
    * (qid, nbr) + one groupBy — evaluation cost is O(k * queries).
    */
  def recallAtK(
      exact: DataFrame,
      approx: DataFrame,
      qidCol: String,
      nbrCol: String,
      k: Int): DataFrame = {
    val hit = approx.select(col(qidCol), col(nbrCol)).withColumn("__hit", lit(1L))
    exact.select(col(qidCol), col(nbrCol))
      .join(hit, Seq(qidCol, nbrCol), "left")
      .groupBy(col(qidCol))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col(qidCol), col("n_hit"),
        round(col("n_hit").cast("double") / k, 6).as("recall"))
      .orderBy(qidCol)
  }
}
