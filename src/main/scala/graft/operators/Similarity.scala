package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Fused single-pass cosine (see [[graft.functions.ArrayCosine]]) —
    * bit-identical to `dot(a,b) / (l2Norm(a) * l2Norm(b))` but one
    * generated function instead of three expression evaluations per
    * candidate pair.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.ArrayCosine(a, b)

  /** Cosine from a precomputed dot and per-row norms, with the
    * [[graft.functions.ArrayCosine]] degenerate policy: a zero norm
    * product yields IEEE NaN instead of Spark 4 ANSI `Divide`'s
    * DIVIDE_BY_ZERO throw — one zero-norm vector must not kill a
    * 100 TB scoring job (filter NaNs downstream; under a DESC sim
    * sort NaN ranks first, same as the fused kernel's output).
    *
    * The `when` branch evaluates lazily in both codegen and
    * interpreted modes, so every non-degenerate pair runs the exact
    * same division as the unguarded form — bit-identical results —
    * while the precomputed norms keep the per-pair cost at one dot
    * (a full ArrayCosine migration would re-accumulate both norms
    * per candidate pair).
    */
  def cosineFromParts(d: Column, na: Column, nb: Column): Column = {
    val dv = na * nb
    when(dv === lit(0.0), lit(Double.NaN)).otherwise(d / dv)
  }

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest
    * `corpus` rows (self-matches by id excluded). Output:
    * (qid, rank 1..k, nbr, sim).
    *
    * NaN-rank contract (uniform across every topK entrypoint in this
    * file): a degenerate (zero-norm) vector scores NaN against every
    * query, and Spark's DESC sort places NaN ABOVE +Infinity — so an
    * all-zero corpus vector occupies rank 1 for every query rather
    * than ranking last. This is deliberate cross-engine parity
    * (DuckDB's ORDER BY DESC ranks NaN first too); callers that want
    * degenerates gone filter `!isnan(col("sim"))` on the output, or
    * drop zero-norm rows at ingest.
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
      .withColumn("sim", cosineFromParts(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
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
    * By default the centroids are the `nCells` lowest-id corpus
    * vectors — deterministic and engine-portable. The production path
    * passes trained [[kmeansCentroids]] via `centroids` (the
    * assignment/probe machinery is identical; k-means cells track the
    * data distribution, so recall at equal probe cost is at least the
    * lowest-id baseline's — asserted in SimilarityExtSpec).
    * Approximate by design: a true neighbor in an unprobed cell is
    * missed; raise `nProbe` for recall.
    *
    * Output: (qid, rank 1..k, nbr, sim).
    */
  /** Cell assignment against a literal centroid table: `(outId,
    * vecOut, normOut, __cell)` rows, one per (row, probed cell).
    * Each centroid similarity is computed ONCE into a bound array
    * column in its own projection; the (negsim, cid) ranking structs
    * reference array elements, not copies of the dot expression —
    * inlining the dots into the structs would replicate every
    * 64-literal dot ~3x per centroid and blow the generated code up
    * by two orders of magnitude. Comparator structs order by
    * similarity DESC with ties to the lower centroid id; NaN (a
    * zero-norm vector) maps to -Infinity so it ranks first, matching
    * NaN's DESC sort position in the oracle.
    */
  private def cellAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      outId: String,
      vecOut: String,
      normOut: String,
      probes: Int): DataFrame = {
    val e = df.select(col(idCol).as(outId), toDoubleArray(col(vecCol)).as(vecOut))
      .withColumn(normOut, l2Norm(col(vecOut)))
    if (cents.isEmpty) return e.withColumn("__cell", lit(null).cast("long")).limit(0)
    val sims =
      graft.functions.PqExpressions.centroidCosines(col(vecOut), col(normOut), cents)
    val entries = cents.zipWithIndex.map { case ((cid, _), i) =>
      val s = element_at(col("__sims"), i + 1)
      struct(
        when(isnan(s), lit(Double.NegativeInfinity)).otherwise(-s).as("negsim"),
        lit(cid).as("cid"))
    }
    val cell =
      if (probes == 1) array_min(array(entries: _*)).getField("cid")
      else explode(transform(
        slice(array_sort(array(entries: _*)), 1, probes), s => s.getField("cid")))
    e.withColumn("__sims", sims)
      .select(col(outId), col(vecOut), col(normOut), cell.as("__cell"))
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 2,
      centroids: Option[Seq[(Long, Array[Double])]] = None): DataFrame = {
    // The centroid table is k x dims doubles — collect it and inline
    // the vectors as LITERALS, so cell assignment is a pure projection
    // (one codegen'd dot per centroid inside array_sort/array_min): no
    // centroid join, no per-row window, and the corpus never shuffles
    // for its assignment. Same layout as the k-means assignment below;
    // driver-side norms use the same sequential fold as the engine's
    // l2Norm, so similarities are bit-identical to the joined form.
    val cents = centroids.map(_.sortBy(_._1)).getOrElse(
      corpus.filter(col(idCol) < nCells)
        .select(col(idCol).cast("long").as("__cid"), toDoubleArray(col(vecCol)).as("__cv"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).toSeq)

    val corpusCells = cellAssign(corpus, idCol, vecCol, cents,
      "nbr", "__cv2", "__cn2", probes = 1)
    val queryCells = cellAssign(queries, idCol, vecCol, cents,
      "qid", "__qv", "__qn", probes = nProbe)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr"))
    queryCells.join(corpusCells, Seq("__cell"))
      .filter(col("qid") =!= col("nbr"))
      .withColumn("sim", cosineFromParts(dot(col("__qv"), col("__cv2")), col("__qn"), col("__cn2")))
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
    val e = kmeansPrep(df, idCol, vecCol)
    val cents = lloydCentroids(e, k, iters)
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
    val result = kmeansAssigned(e, cents)
      .select(col("__id").as(idCol), col("__cid").as("cluster"),
        col("__csim").as("sim"))
    Dedup.CachedDF(result, Nil,
      Seq(() => org.apache.spark.sql.graftbridge.unpersistCheckpointed(e)))
  }

  /** Final Lloyd centroids only — the trained cell table to hand to
    * [[ivfTopK]]'s `centroids` parameter. Same init/update arithmetic
    * as [[kmeansAssignCached]] (shared helpers), so an oracle that
    * replays the Lloyd CTEs reproduces these exactly. The checkpointed
    * working set is released before returning.
    */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val e = kmeansPrep(df, idCol, vecCol)
    try lloydCentroids(e, k, iters)
    finally org.apache.spark.sql.graftbridge.unpersistCheckpointed(e)
  }

  // the corpus is re-scanned once per iteration: checkpoint so each
  // pass reads materialized rows, not the source pipeline
  private def kmeansPrep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
      .localCheckpoint()

  /** Per row, the lexicographic array_min over (-sim, cid) structs
    * picks the highest similarity with ties to the lower centroid id,
    * exactly the ORDER BY sim DESC, cid convention of the SQL oracle;
    * a NaN similarity (zero-norm centroid) maps to -Infinity so it
    * still ranks FIRST, as NaN does under both engines' DESC ordering.
    */
  private def kmeansAssigned(
      e: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    // all similarities land ONCE in a bound array column through the
    // fused centroid_cosines node (same dot fold / cosine association
    // as the dot-literal array it replaces — see PqExpressions); the
    // ranking structs below reference elements of it, so the
    // comparator semantics are untouched
    val sims =
      graft.functions.PqExpressions.centroidCosines(col("__v"), col("__n"), cents)
    val entries = cents.zipWithIndex.map { case ((cid, _), i) =>
      val s = element_at(col("__sims"), i + 1)
      // negsim orders; the raw sim rides along (3rd field — cid is
      // unique, so it never participates in the comparison) to keep
      // the output value NaN when the similarity is NaN
      struct(
        when(isnan(s), lit(Double.NegativeInfinity))
          .otherwise(-s).as("negsim"),
        lit(cid).as("cid"),
        s.as("sim"))
    }
    e.withColumn("__sims", sims)
      .withColumn("__best", array_min(array(entries: _*)))
      .select(col("__id"), col("__v"), col("__n"),
        col("__best.cid").as("__cid"),
        col("__best.sim").as("__csim"))
  }

  /** Lowest-id init + `iters` exact micro-unit Lloyd updates over a
    * [[kmeansPrep]] frame; empty when no id falls below `k`.
    */
  private def lloydCentroids(
      e: DataFrame, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    var cents: Seq[(Long, Array[Double])] = e.filter(col("__id") < k)
      .select(col("__id"), col("__v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    if (cents.isEmpty) return Nil
    for (_ <- 1 to iters) {
      // micro-unit exact centroid update (the q62 formulation)
      val micro = kmeansAssigned(e, cents)
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
    cents
  }

  /** Assign every row to its nearest of the GIVEN trained centroids —
    * the stored IVF cell layer applied to a corpus, no training, one
    * pass, no checkpoint (nothing iterates). Output:
    * `(id, cluster, sim)`. Assignment/tie/NaN rules are
    * [[kmeansAssignCached]]'s (the same [[kmeansAssigned]] kernel), so
    * a vector assigns to the exact cell it trained in — the
    * precondition for cell-layer health reports over a frozen index.
    */
  def kmeansAssignWithCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "empty centroid set")
    val e = df
      .select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
    kmeansAssigned(e, cents)
      .select(col("__id").as(idCol), col("__cid").as("cluster"),
        col("__csim").as("sim"))
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
      .withColumn("sim", cosineFromParts(dot(col("__v1"), col("__v2")), col("__n1"), col("__n2")))
      .filter(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedding corpus WITHIN the cells of a stored
    * k-means index — the paper's tractability move applied Spark-first:
    * pairwise cosine runs only INSIDE a cluster (an equi-join on the
    * cell id), never across the corpus, so the quadratic term is
    * bounded by the largest cell (itself rebalanceable via the
    * hot-cell split, q173) and nothing is ever corpus × corpus.
    *
    * Deterministic keep rule: a vector is dropped iff some SMALLER-id
    * member of its cell matches it at `>= threshold` — keep-lowest-id,
    * the greedy one-representative-per-ε-ball rule under a total
    * order, so the output is reproducible across partitionings and
    * engines (no "arbitrary representative"). Returns one row per
    * vector: (idCol, cluster, nn_sim = max cosine to a smaller-id
    * same-cell member rounded to 6 — NULL for the cell's smallest id,
    * keep). The threshold compares against the ROUNDED nn_sim so the
    * oracle twin agrees exactly at the boundary.
    *
    * Cell assignment reuses the frozen-index kernel
    * ([[kmeansAssignWithCentroids]] — centroids inlined as literals,
    * pure projection, no shuffle for assignment); the pairwise join
    * carries (vector, norm) once per side keyed on the cell id.
    */
  def semDeDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      threshold: Double): DataFrame = {
    // single projection per join side: assignment carries the vector
    // and its norm through (kmeansAssigned keeps __v/__n), so there is
    // no id-keyed join of df against its own assignment — the round-15
    // shape double-evaluated df and could shuffle on the id
    val m = assignedWithVec(df, idCol, vecCol, cents)
    val a = m.select(col("cluster"), col(idCol).as("__u"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = m.select(col("cluster"), col(idCol).as("__w"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val nn = a.join(b, Seq("cluster"))
      .filter(col("__u") < col("__w"))
      .select(col("__w").as(idCol),
        cosineFromParts(dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")).as("__c"))
      .groupBy(col(idCol))
      .agg(round(max(col("__c")), 6).as("nn_sim"))
    m.select(col(idCol), col("cluster"))
      .join(nn, Seq(idCol), "left")
      .withColumn("keep", col("nn_sim").isNull || col("nn_sim") < threshold)
  }

  /** The INCREMENTAL leg of [[semDeDup]]: dedup a batch of NEW vectors
    * against an already-ingested corpus through the same stored
    * k-means index — the shape a production embedding ingest actually
    * runs. Each new vector is assigned to its cell (a pure projection
    * over the centroid literals, no shuffle) and compared against
    *  (a) EVERY existing member of that cell, and
    *  (b) the smaller-id NEW members of that cell (the [[semDeDup]]
    *      keep-lowest-id rule applied within the batch),
    * and NEVER against anything outside the cell. Crucially there is
    * no existing × existing term: ingest cost is |batch| × cell
    * occupancy however large the corpus has grown, which is what makes
    * continuous semantic dedup affordable at 100 TB. Pass the KEPT
    * representatives as `existing` for the paper's
    * one-representative-per-ε-ball semantics, or the full corpus for
    * exact parity with a from-scratch [[semDeDup]] over the union
    * (when all existing ids are smaller than every new id, the output
    * is bit-identical to [[semDeDup]]'s rows for the new ids — the
    * oracle property q194 checks).
    *
    * Returns one row per NEW vector: (idCol, cluster, nn_sim = max
    * cosine to any candidate rounded to 6 — NULL when the cell holds
    * no candidate, keep = nn_sim below `threshold`).
    */
  def semDeDupIncrement(
      existing: DataFrame,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      threshold: Double): DataFrame =
    semDeDupIncrementAssigned(
      semDeDupAssign(existing, idCol, vecCol, cents),
      fresh, idCol, vecCol, cents, threshold)

  /** Assign vectors to their stored-index cells in the
    * (idCol, vecCol, cluster) shape [[semDeDupIncrementAssigned]]
    * consumes — truly ONE projection over the centroid literals now
    * (round-16 fix: the previous body joined df against its own
    * assignment, double-evaluating df with a possible id shuffle;
    * [[kmeansAssigned]] carries the vector through instead). The
    * vector column comes back as `array<double>` whatever the input
    * width — the normalized form every consumer re-derives anyway. A
    * continuous ingest persists THIS shape as its representative
    * state so assignment is paid once per vector at admission, never
    * re-run over the whole state per batch.
    */
  def semDeDupAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])]): DataFrame =
    assignedWithVec(df, idCol, vecCol, cents)
      .select(col(idCol), col("__v").as(vecCol), col("cluster"))

  /** The shared assignment projection of the SemDeDup family:
    * (idCol, __v, __n, cluster), one pass, no join — assignment,
    * vector and norm all ride the same row.
    */
  private def assignedWithVec(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "empty centroid set")
    kmeansAssigned(
        df.select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
          .withColumn("__n", l2Norm(col("__v"))), cents)
      .select(col("__id").as(idCol), col("__v"), col("__n"),
        col("__cid").as("cluster"))
  }

  /** [[semDeDupIncrement]] with the existing side PRE-ASSIGNED
    * (carrying a `cluster` column, the [[semDeDupAssign]] shape): the
    * batch assigns fresh vectors only, so per-batch work is exactly
    * |batch| assignment projections plus the within-cell joins —
    * nothing corpus-sized recomputes as the representative state
    * grows.
    */
  def semDeDupIncrementAssigned(
      existing: DataFrame,
      fresh: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      threshold: Double): DataFrame = {
    val ex = existing
      .select(col(idCol), toDoubleArray(col(vecCol)).as("__v"), col("cluster"))
      .withColumn("__n", l2Norm(col("__v")))
    // assignedWithVec is one projection (no join), so the three plan
    // branches over nw below each re-run only a scan + the centroid
    // projection of the BATCH — cheap enough that persisting every
    // micro-batch would cost more than it saves
    val nw = assignedWithVec(fresh, idCol, vecCol, cents)
    def aSide(df: DataFrame) = df.select(col("cluster"),
      col("__v").as("__va"), col("__n").as("__na"))
    val nwB = nw.select(col("cluster"), col(idCol).as("__w"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // candidate pairs: new × existing (all of the cell) plus
    // new × smaller-id new — the only quadratic term is within-batch
    val vsExisting = aSide(ex).join(nwB, Seq("cluster"))
    val vsFresh = nw.select(col("cluster"), col(idCol).as("__u"),
        col("__v").as("__va"), col("__n").as("__na"))
      .join(nwB, Seq("cluster"))
      .filter(col("__u") < col("__w"))
      .drop("__u")
    val nn = vsExisting.unionByName(vsFresh)
      .select(col("__w").as(idCol),
        cosineFromParts(dot(col("__va"), col("__vb")),
          col("__na"), col("__nb")).as("__c"))
      .groupBy(col(idCol))
      .agg(round(max(col("__c")), 6).as("nn_sim"))
    nw.select(col(idCol), col("cluster"))
      .join(nn, Seq(idCol), "left")
      .withColumn("keep", col("nn_sim").isNull || col("nn_sim") < threshold)
  }

  /** Fail-fast bound on the SemDeDup family's quadratic term (round
    * 16): the within-cell pairwise cosine costs `Σ_cell n·(n−1)/2`
    * comparisons, "bounded by the largest cell" — but nothing enforced
    * that bound until now, so a skewed index (90% of vectors in one
    * cell) would silently melt the one task that cell lands on.
    * This guard assigns the corpus through the same stored-centroid
    * projection (one pass, a #cells-row aggregate — no pairwise work)
    * and throws a NAMED error when any single cell's pair count
    * exceeds `maxCellPairs`, pointing at the remediation the suite
    * already ships: the q173 hot-cell split (re-quantize the hot cell
    * into sub-cells and atomically commit the rebalanced index) or an
    * index retrain at larger k. Run it before [[semDeDup]] /
    * [[semDeDupIncrement]] whenever the index is not known-balanced
    * (the [[graft.operators.Dedup]] hot-bucket-cap discipline applied
    * to the embedding side).
    */
  def semDeDupCellGuard(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      maxCellPairs: Long): Unit = {
    require(maxCellPairs > 0, "maxCellPairs must be positive")
    val occ = assignedWithVec(df, idCol, vecCol, cents)
      .groupBy(col("cluster")).agg(count(lit(1)).as("__n"))
      .collect()
    occ.foreach { r =>
      val cid = r.getLong(0)
      val n = r.getLong(1)
      val pairs = n * (n - 1) / 2
      if (pairs > maxCellPairs) throw new IllegalStateException(
        s"SemDeDup hot cell: cluster $cid holds $n vectors " +
          s"(${pairs} within-cell pairs > cap $maxCellPairs) — " +
          "rebalance before deduping: split the hot cell " +
          "(Similarity.ivfSplitHotCells, the q173 path) or retrain " +
          "the stored index at larger k")
    }
  }

  /** Per-dimension int8 scalar-quantization report: quantize each
    * dimension to 256 levels over its [min, max] range and report the
    * reconstruction error — the go/no-go numbers for shipping a
    * quantized ANN index (4x smaller vectors) instead of float32.
    *
    * Two scans, both reduced map-side: pass 1 aggregates per-dim
    * min/max (D rows), pass 2 broadcasts those stats back, quantizes
    * per element, and aggregates the error moments per dim. No shuffle
    * ever carries more than D x partitions partial rows. Per-element
    * squared errors are rounded to 12 decimals and decimal-summed, so
    * the MSE is exact and engine-portable; max-abs-error is an exact
    * selection over identically-computed doubles.
    */
  def quantizationReport(df: DataFrame, vecCol: String): DataFrame = {
    val el = df.select(posexplode(toDoubleArray(col(vecCol))).as(Seq("dim", "x")))
    val stats = el.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val scale = (col("mx") - col("mn")) / lit(255.0)
    // a constant dimension (mx == mn) quantizes to level 0 exactly
    val q = when(col("mx") === col("mn"), lit(0.0))
      .otherwise(least(greatest(
        round((col("x") - col("mn")) / scale, 0), lit(0.0)), lit(255.0)))
    val err = col("x") - (col("mn") + q * scale)
    el.join(broadcast(stats), "dim")
      .select(col("dim"), col("mn"), col("mx"),
        round(err * err, 12).cast("decimal(24,12)").as("__e2"),
        abs(err).as("__ae"))
      .groupBy(col("dim").cast("long").as("dim"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__e2")).cast("double") / count(lit(1)), 9).as("mse"),
        round(max(col("__ae")), 6).as("max_abs_err"))
      .select(col("dim"), col("n"),
        round(col("mn"), 6).as("mn"), round(col("mx"), 6).as("mx"),
        col("mse"), col("max_abs_err"))
      .orderBy("dim")
  }

  /** Two-phase int8 retrieve-then-rescore top-k (the production ANN
    * serving pattern): phase 1 scores every query against the
    * int8-QUANTIZED corpus (asymmetric distance — the float query
    * against the reconstructed corpus vector, so only the corpus pays
    * the 4x compression) and keeps the top `k * refine` candidates per
    * query; phase 2 rescores just those candidates with the exact
    * float cosine and emits the top `k`. `coarse_rank` in the output
    * shows where rescoring reordered the quantized shortlist.
    *
    * Quantization is [[quantizationReport]]'s per-dimension affine
    * scheme (256 levels over [min, max], constant dims pin to mn), so
    * the go/no-go report and the search index share one definition.
    *
    * Scale shape: the per-dim stats are D rows — collected and inlined
    * as LITERAL arrays (the centroid pattern), so corpus
    * reconstruction is a pure projection; the coarse phase streams the
    * corpus against the broadcast query side with NO corpus shuffle,
    * and the shortlist runs through the heap-bounded TopKPerKey
    * physical operator (never a full per-query sort); the rescore
    * joins the corpus against the BROADCAST candidate set (|Q| x
    * k x refine rows), so the second corpus pass is also shuffle-free.
    * At 100 TB the expensive exact math touches only the shortlist.
    *
    * Output: (qid, rank 1..k, nbr, sim, coarse_rank).
    */
  def int8RescoreTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      refine: Int = 3): DataFrame = {
    require(k > 0 && refine > 0, "k and refine must be positive")
    val stats = corpus
      .select(posexplode(toDoubleArray(col(vecCol))).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("dim")
      .collect() // D rows (embedding width) — bounded like the centroid tables
    val mns = stats.map(_.getDouble(1)).toSeq
    val scs = stats.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0).toSeq
    val mnL = typedLit(mns)
    val scL = typedLit(scs)
    def reconstruct(v: Column): Column = transform(v, (x, d) => {
      val m = element_at(mnL, d + 1)
      val s = element_at(scL, d + 1)
      when(s === 0.0, m).otherwise(
        m + least(greatest(round((x - m) / s, 0), lit(0.0)), lit(255.0)) * s)
    })

    val q = broadcast(queries
      .select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv"))))
    val c = corpus
      .select(col(idCol).as("nbr"), toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__rc", reconstruct(col("__cv")))
      .withColumn("__rcn", l2Norm(col("__rc")))
    val coarse = q.join(c, col("qid") =!= col("nbr"))
      .withColumn("__csim",
        cosineFromParts(dot(col("__qv"), col("__rc")), col("__qn"), col("__rcn")))
      .select(col("qid"), col("nbr"), col("__csim"))
    val cands = graft.plans.TopKPerKey.topk(coarse, Seq("qid"),
        Seq(graft.plans.TopKPerKey.Desc("__csim"), graft.plans.TopKPerKey.Asc("nbr")),
        k * refine)
      .withColumnRenamed("rank", "coarse_rank")
      .select(col("qid"), col("nbr"), col("coarse_rank"))

    val cExact = corpus
      .select(col(idCol).as("nbr"), toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv")))
    val exact = cExact
      .join(broadcast(cands.join(q, "qid")), "nbr")
      .withColumn("sim", cosineFromParts(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr"))
    exact
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"), col("coarse_rank"))
  }

  /** DuckDB SQL twin of [[int8RescoreTopK]] over a table with `vec_id`
    * and a `dims`-wide `embedding` list column, queries = vec_id <
    * `nQueries`. The quantization arithmetic mirrors
    * [[quantizationReportSql]] term for term; candidate selection and
    * rescoring use the same (score DESC, nbr) total order as the Spark
    * side.
    */
  def int8RescoreSql(src: String, dims: Int, nQueries: Int, k: Int,
      refine: Int = 3): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM $src),
       |el AS (SELECT d.dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS x
       |       FROM $src CROSS JOIN (SELECT unnest(range($dims)) AS dim) d
       |       WHERE d.dim < len(embedding)),
       |st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM el GROUP BY 1),
       |arrs AS (SELECT list(mn ORDER BY dim) AS mns,
       |                list((mx - mn) / 255.0 ORDER BY dim) AS scs FROM st),
       |c AS (SELECT vec_id AS nbr, v,
       |        list_transform(range($dims), d -> CASE WHEN a.scs[d + 1] = 0 THEN a.mns[d + 1]
       |          ELSE a.mns[d + 1] + least(greatest(round((v[d + 1] - a.mns[d + 1]) / a.scs[d + 1]), 0.0), 255.0) * a.scs[d + 1]
       |          END) AS rc
       |      FROM e, arrs a),
       |cn AS (SELECT nbr, v, rc, sqrt(list_dot_product(v, v)) AS vn,
       |              sqrt(list_dot_product(rc, rc)) AS rcn FROM c),
       |q AS (SELECT vec_id AS qid, v AS qv, sqrt(list_dot_product(v, v)) AS qn
       |      FROM e WHERE vec_id < $nQueries),
       |cand AS (SELECT qid, nbr, CAST(rn AS BIGINT) AS coarse_rank FROM (
       |  SELECT q.qid, cn.nbr,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid
       |      ORDER BY list_dot_product(q.qv, cn.rc) / (q.qn * cn.rcn) DESC, cn.nbr) AS rn
       |  FROM q JOIN cn ON cn.nbr <> q.qid) t WHERE rn <= ${k * refine}),
       |ex AS (SELECT cand.qid, cand.nbr, cand.coarse_rank,
       |         list_dot_product(q.qv, cn.v) / (q.qn * cn.vn) AS sim
       |       FROM cand JOIN q USING (qid) JOIN cn USING (nbr)),
       |r AS (SELECT qid, nbr, coarse_rank, sim,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nbr) AS BIGINT) AS rank
       |      FROM ex)
       |SELECT qid, rank, nbr, round(sim, 5) AS sim, coarse_rank
       |FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** DuckDB SQL equivalent of [[quantizationReport]] for a table with
    * an `embedding` list column of `dims` elements.
    */
  def quantizationReportSql(src: String, dims: Int): String =
    s"""WITH d AS (SELECT unnest(range($dims)) AS dim),
       |el AS (SELECT d.dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS x
       |       FROM $src CROSS JOIN d WHERE d.dim < len(embedding)),
       |st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM el GROUP BY 1),
       |e AS (SELECT el.dim, st.mn, st.mx,
       |        el.x - (st.mn + (CASE WHEN st.mx = st.mn THEN 0.0
       |          ELSE least(greatest(round((el.x - st.mn) / ((st.mx - st.mn) / 255.0)), 0.0), 255.0)
       |          END) * ((st.mx - st.mn) / 255.0)) AS err
       |      FROM el JOIN st USING (dim))
       |SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
       |  round(mn, 6) AS mn, round(mx, 6) AS mx,
       |  round(CAST(SUM(CAST(round(err * err, 12) AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*), 9) AS mse,
       |  round(MAX(abs(err)), 6) AS max_abs_err
       |FROM e GROUP BY dim, mn, mx ORDER BY dim""".stripMargin

  /** Deterministic signed-random-projection hyperplanes: `k` rows of
    * `dims` values in {-1.0, +1.0}, derived from md5 of "srp:i:d" —
    * reproducible in any engine, no RNG state. The classic SRP-LSH
    * family for cosine similarity (Charikar 2002): vectors on the same
    * side of all k hyperplanes land in the same bucket, and
    * P[same bit] = 1 - angle/pi per plane.
    */
  def srpSigns(k: Int, dims: Int): Seq[Seq[Double]] = srpSigns(k, dims, 0)

  /** [[srpSigns]] for rotation `family` — family 0 is the original
    * q105/q106 plane set (seed strings unchanged); higher families are
    * independent draws, for multi-probe recall boosting: a near pair
    * split by one family's hyperplane meets under another with
    * probability 1 - (1 - (1 - θ/π)^k)^families.
    */
  def srpSigns(k: Int, dims: Int, family: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val tag = if (family == 0) "srp" else s"srp$family"
    (0 until k).map { i =>
      (0 until dims).map { d =>
        val h = md.digest(s"$tag:$i:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** SRP-LSH bucket per vector: bit `i` of the bucket string is the
    * sign of the projection onto hyperplane `i`. One bound projection
    * array (each dot computed once), bucket assembly is pure string
    * concat — no explode, no shuffle; the bucket becomes the join /
    * groupBy key of whatever blocking step follows.
    *
    * `dims` must match the embedding width: the dot product folds over
    * min(length), so a too-small value silently projects onto a
    * truncated hyperplane (and a DuckDB twin would diverge — its
    * list_dot_product handles mismatched lengths differently). Pass it
    * through [[srpBucketSqlExpr]] with the same value.
    */
  def srpBuckets(df: DataFrame, idCol: String, vecCol: String, k: Int,
      dims: Int = 64): DataFrame = {
    val signs = srpSigns(k, dims)
    val e = df.select(col(idCol), toDoubleArray(col(vecCol)).as("__v"))
    val projs = array(signs.map(s => dot(col("__v"), typedLit(s))): _*)
    val bits = (0 until k).map(i =>
      when(element_at(col("__projs"), i + 1) >= 0, lit("1")).otherwise(lit("0")))
    e.withColumn("__projs", projs)
      .select(col(idCol), concat(bits: _*).as("bucket"))
  }

  /** Near-duplicate candidate pairs from [[srpBuckets]] blocking with
    * the exact cosine computed only within buckets — same scale shape
    * as [[signBucketNearDupPairs]] but with rotation-invariant SRP
    * hyperplanes instead of leading-dimension signs.
    *
    * `families` is the same recall dial [[semanticContamination]]'s
    * blocked path carries: each extra family is an INDEPENDENT
    * [[srpSigns]] hyperplane draw whose bucket-blocked pairs union in
    * (multi-probe style) — a near pair split by one family's planes
    * meets under another with probability
    * 1 - (1 - (1 - θ/π)^k)^families. Cost is corpus-linear per family
    * (one extra projection + one bucket self-join), never a cross
    * product; a pair surviving several families computes the SAME
    * exact cosine in each, so the cross-family `distinct` dedupes it
    * losslessly. `families = 1` (the default) is byte-identical to the
    * pre-dial operator — q106's oracle pins that.
    */
  def srpCandidatePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      dims: Int = 64,
      families: Int = 1): DataFrame = {
    require(families >= 1, "families must be >= 1")
    val e = df.select(col(idCol), toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
    def pairsForFamily(family: Int): DataFrame = {
      val signs = srpSigns(k, dims, family)
      val projs = array(signs.map(s => dot(col("__v"), typedLit(s))): _*)
      val bits = (0 until k).map(i =>
        when(element_at(col("__projs"), i + 1) >= 0, lit("1")).otherwise(lit("0")))
      val ann = e.withColumn("__projs", projs)
        .withColumn("bucket", concat(bits: _*))
        .drop("__projs")
      val a = ann.select(col("bucket"), col(idCol).as("d1"),
        col("__v").as("__v1"), col("__n").as("__n1"))
      val b = ann.select(col("bucket"), col(idCol).as("d2"),
        col("__v").as("__v2"), col("__n").as("__n2"))
      a.join(b, Seq("bucket"))
        .filter(col("d1") < col("d2"))
        .withColumn("sim", cosineFromParts(dot(col("__v1"), col("__v2")), col("__n1"), col("__n2")))
        .filter(col("sim") >= threshold)
        .select(col("d1"), col("d2"), col("sim"))
    }
    val perFamily = (0 until families).map(pairsForFamily)
    if (families == 1) perFamily.head
    else perFamily.reduce(_ unionByName _).distinct()
  }

  /** DuckDB bucket expression matching [[srpBuckets]]: a `||` concat of
    * per-plane sign bits over `list_dot_product` with the same literal
    * hyperplanes (the sequential-fold parity trick of the ANN oracles).
    */
  def srpBucketSqlExpr(vExpr: String, k: Int, dims: Int = 64): String =
    srpSigns(k, dims).map { s =>
      val lst = s.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vExpr, $lst) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

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

  /** Ad-hoc probe query: the `k` corpus vectors nearest to ONE given
    * vector (a user's interactive "what's similar to this?" — the
    * degenerate ANN case where building any index is overkill). The
    * probe row is collected (one row) and inlined as a literal array,
    * so the corpus streams through a single fused-cosine projection
    * ([[graft.functions.ArrayCosine]] — one generated loop per row,
    * no per-row norm sub-expressions) into a TakeOrdered top-k: heap
    * per partition, k rows to the driver, no shuffle of the corpus.
    */
  def probeTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probeId: Long,
      k: Int): DataFrame = {
    val pv = corpus.filter(col(idCol) === probeId)
      .select(toDoubleArray(col(vecCol)).as("v"))
      .head().getSeq[Double](0)
    val probe = array(pv.map(lit): _*)
    corpus.filter(col(idCol) =!= probeId)
      .select(col(idCol),
        cosine(toDoubleArray(col(vecCol)), probe).as("__sim"))
      // ArrayCosine yields NaN for a zero-norm vector, and Spark sorts
      // NaN ABOVE every double in a DESC order — without this filter a
      // degenerate corpus vector would win rank 1 for every probe
      .filter(!isnan(col("__sim")))
      .orderBy(col("__sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__sim"), 5).as("sim"))
  }

  /** Semantic decontamination: flag corpus vectors whose cosine
    * similarity to ANY eval-set vector reaches `threshold` — the
    * embedding-space analogue of the n-gram decontamination in
    * `Decontaminate` (exact shingle overlap misses paraphrased
    * benchmark leakage; embedding proximity catches it). Output per
    * flagged corpus id: how many eval vectors it matched, the best
    * (rounded) similarity, and the lowest matching eval id.
    *
    * Plan shape with `evalBroadcast = true` (the default) =
    * [[bruteForceTopK]]'s: the eval side broadcasts (benchmarks are
    * small by definition), the corpus streams through one codegen'd
    * dot-product projection and ONE partial-aggregated groupBy — no
    * corpus shuffle before the aggregate's own, and comparison is
    * EXHAUSTIVE (every corpus×eval pair scored).
    *
    * `evalBroadcast = false` is the scale path for an eval set too big
    * to broadcast (a 10M-row held-out split): both sides are blocked
    * with the same deterministic [[srpBuckets]] hyperplanes (`srpBits`
    * planes over `dims` dimensions — q106's shape) and joined on the
    * bucket key, an ordinary shuffled equi-join with NO broadcast and
    * NO nested-loop product. The threshold then applies to the
    * bucket-joined pairs exactly as in the broadcast path. The trade
    * is the standard SRP one: a pair split by any hyperplane never
    * meets, so near-threshold contamination can be missed — raise
    * recall by lowering `srpBits` (fewer, bigger buckets) or raising
    * `srpFamilies` (independent rotated plane sets whose candidates
    * union, multi-probe style), both corpus-linear: families cost one
    * extra corpus projection + bucket join each, never a cross
    * product, and a pair surviving several families is deduplicated
    * before the aggregate so hit counts match the broadcast path's.
    */
  def semanticContamination(
      evalSet: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      evalBroadcast: Boolean = true,
      srpBits: Int = 8,
      dims: Int = 64,
      srpFamilies: Int = 1): DataFrame = {
    require(srpFamilies >= 1, "srpFamilies must be >= 1")
    // eval set and corpus are SEPARATE datasets: every corpus row is
    // compared against every eval row. (An id-equality exclusion here
    // would silently skip real comparisons whenever the two id spaces
    // overlap by coincidence — if the corpus still contains the eval
    // rows themselves, filter them out upstream, as q119 does.)
    def score(pairs: DataFrame): DataFrame = pairs
      .withColumn("sim", cosineFromParts(dot(col("__cv"), col("__qv")), col("__cn"), col("__qn")))
      .filter(col("sim") >= threshold)
      .select(col("cid"), col("eid"), col("sim"))
    val scored =
      if (evalBroadcast) {
        val q = broadcast(
          evalSet.select(col(idCol).as("eid"), toDoubleArray(col(vecCol)).as("__qv"))
            .withColumn("__qn", l2Norm(col("__qv"))))
        score(corpus
          .select(col(idCol).as("cid"), toDoubleArray(col(vecCol)).as("__cv"))
          .withColumn("__cn", l2Norm(col("__cv")))
          .crossJoin(q))
      } else {
        // (id, vec, norm, bucket) per side and family — one stateless
        // projection each, no explode: within a family a vector
        // belongs to exactly one bucket, so a pair is scored once per
        // family it survives, and the cross-family union dedupes
        def annotated(df: DataFrame, id: String, v: String, n: String,
            family: Int): DataFrame = {
          val signs = srpSigns(srpBits, dims, family)
          val projs = array(signs.map(s => dot(col(v), typedLit(s))): _*)
          val bits = (0 until srpBits).map(i =>
            when(element_at(col("__projs"), i + 1) >= 0, lit("1")).otherwise(lit("0")))
          df.select(col(idCol).as(id), toDoubleArray(col(vecCol)).as(v))
            .withColumn(n, l2Norm(col(v)))
            .withColumn("__projs", projs)
            .withColumn("__bkt", concat(bits: _*))
            .drop("__projs")
        }
        val perFamily = (0 until srpFamilies).map { f =>
          score(annotated(corpus, "cid", "__cv", "__cn", f)
            .join(annotated(evalSet, "eid", "__qv", "__qn", f), "__bkt"))
        }
        if (srpFamilies == 1) perFamily.head
        else perFamily.reduce(_ unionByName _).distinct()
      }
    scored
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_eval_hits"),
        round(max(col("sim")), 5).as("max_sim"),
        min(col("eid")).as("first_eval_id"))
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ) + asymmetric-distance (ADC) search
  // ------------------------------------------------------------------

  /** Per-subspace PQ codebooks (Jégou, Douze & Schmid, TPAMI 2011
    * "Product quantization for nearest neighbor search"):
    * [[kmeansCentroids]] trained independently on each of the `m`
    * contiguous `dims/m`-wide slices of the corpus vectors, each book
    * sorted by centroid id. Same exact micro-unit Lloyd updates as the
    * full-width path, so every centroid coordinate is reproducible by
    * the SQL oracle bit-for-bit.
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      ks: Int,
      iters: Int): Seq[Seq[(Long, Array[Double])]] = {
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val sub = dims / m
    // All m subspaces train in ONE Lloyd loop over a single exploded
    // frame (__mi, __id, __v): one checkpoint and one driver
    // round-trip per iteration instead of m independent loops of
    // `iters` collects each (12 jobs -> 3 at m=4/iters=3 — the PQ
    // queries were driver-gap-bound, half their wall time between
    // stages). Init, assignment and the micro-unit update are applied
    // per (__mi) with the exact [[kmeansCentroids]] rules, so the
    // books are bit-identical to per-subspace training and the
    // oracle's per-subspace replay is untouched.
    val cv = toDoubleArray(col(vecCol))
    val e = corpus
      .select(col(idCol).as("__id"), cv.as("__fv"))
      .select(col("__id"), explode(array((0 until m).map(mi =>
        struct(lit(mi).as("mi"),
          slice(col("__fv"), mi * sub + 1, sub).as("v"))): _*)).as("__s"))
      .select(col("__s.mi").as("__mi"), col("__id"), col("__s.v").as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
      .localCheckpoint()
    try {
      val init = e.filter(col("__id") < ks)
        .select(col("__mi"), col("__id"), col("__v")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
      var books: Vector[Seq[(Long, Array[Double])]] = (0 until m).map(mi =>
        init.filter(_._1 == mi).map(t => t._2 -> t._3)
          .sortBy(_._1).toSeq).toVector
      // ids are shared across subspaces: either every book inits or none
      if (books.head.isEmpty) return (0 until m).map(_ => Nil)
      for (_ <- 1 to iters) {
        // per-subspace assignment in ONE fused pq_train_assign node
        // (see PqExpressions) — same cosine/NaN/tie rules as the
        // array_min-over-struct tree it replaces, but the plan no
        // longer re-analyzes m·ks dot literals per iteration
        val micro = e
          .withColumn("__cid", graft.functions.PqExpressions.pqTrainAssign(
            col("__mi"), col("__v"), col("__n"), books, sub))
          .select(col("__mi"), col("__cid"), posexplode(col("__v")).as(Seq("dim", "x")))
          .withColumn("__m", round(round(col("x"), 6) * 1e6).cast("long"))
          .groupBy(col("__mi"), col("__cid"), col("dim"))
          .agg(sum(col("__m")).as("__s"), count(lit(1)).as("__cnt"))
          .select(col("__mi"), col("__cid"), col("dim"),
            (when(col("__s") < 0, -1L).otherwise(1L) *
              expr("(2 * abs(__s) + __cnt) div (2 * __cnt)")).as("cm"))
          .collect()
        books = (0 until m).map { mi =>
          micro.filter(_.getInt(0) == mi)
            .groupBy(_.getLong(1))
            .map { case (cid, rs) =>
              cid -> rs.sortBy(_.getInt(2))
                .map(_.getLong(3).toDouble / 1e6).toArray
            }
            .toSeq.sortBy(_._1)
        }.toVector
      }
      books
    } finally org.apache.spark.sql.graftbridge.unpersistCheckpointed(e)
  }

  // The per-sub-vector PQ code rule (index of the cosine-maximizing
  // centroid, NaN → never chosen, ties to the lower index — the SAME
  // assignment rule the k-means training used, so a training vector
  // encodes to the cell it trained in) lives in the fused
  // [[graft.functions.PqExpressions.pqCodes]] expression: one Catalyst
  // node per row instead of m array_min-over-dot-literal trees.

  /** PQ-ADC approximate top-k with exact rescoring — the
    * memory-bound end of the ANN family (brute q26 → IVF q32/q113 →
    * int8 rescore q116 → THIS): the corpus collapses to `m` small
    * integer codes per vector (64 float dims → 4 bytes at
    * m=4/ks=256), so a 100 TB embedding corpus's search structure
    * fits in cluster RAM and the coarse pass never touches a float
    * vector.
    *
    * Shape per ADC (asymmetric distance computation): the QUERY side —
    * tiny, broadcast — precomputes its lookup table of `m × ks`
    * query-sub-vector·centroid dots ONCE per query; the corpus-side
    * coarse pass is then `m` array lookups + adds per row
    * (`element_at` into the broadcast LUT by code), no dot products at
    * all. Approx cosine uses the reconstruction norm
    * `||x̂||² = Σ_m ||c_{m,code}||²` from a codebook-norm literal —
    * both factors exact doubles reproducible by the oracle. Coarse
    * top `k·refine` per query via the heap-bounded
    * [[graft.plans.TopKPerKey]], then exact-cosine rescore of just
    * those candidates (the int8-rescore pattern).
    *
    * Output: `(qid, rank, nbr, sim, coarse_rank)` — `sim` is the
    * EXACT cosine of the reranked top `k`, `coarse_rank` the ADC
    * position that surfaced the candidate.
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      ks: Int,
      iters: Int,
      k: Int,
      refine: Int = 3): DataFrame =
    pqTopKWithBooks(queries, corpus, idCol, vecCol, dims,
      pqCodebooks(corpus, idCol, vecCol, dims, m, ks, iters), k, refine)

  /** [[pqTopK]] against PRE-TRAINED codebooks — the production shape:
    * a PQ index's books are a stored artifact trained once, reused by
    * every search (and by incremental ingest, which must encode new
    * vectors against the FROZEN books rather than retrain per batch).
    */
  def pqTopKWithBooks(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      books: Seq[Seq[(Long, Array[Double])]],
      k: Int,
      refine: Int = 3): DataFrame =
    pqSearchWithCodes(queries,
      pqEncodeCodes(corpus, idCol, vecCol, dims, books),
      corpus, idCol, vecCol, dims, books, k, refine)

  /** Corpus → `(nbr, __code_0..__code_{m−1})` against FROZEN books —
    * the PQ index's per-row state, exposed so incremental ingest can
    * encode only the NEW batch and union it with stored codes instead
    * of re-encoding (or worse, re-training on) the whole corpus per
    * batch. Same assignment + tie rule as training (the fused
    * [[graft.functions.PqExpressions.pqCodes]] expression), so a
    * training vector encodes to the cell it trained in.
    */
  def pqEncodeCodes(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame = {
    val m = books.size
    require(m > 0 && dims % m == 0, s"books size $m must divide dims=$dims")
    val sub = dims / m
    val cv = toDoubleArray(col(vecCol))
    // one fused pq_codes node (see PqExpressions) instead of m
    // array_min-over-dot-literal trees: same codes bit-for-bit,
    // constant-size plan
    corpus
      .select(col(idCol).as("nbr"),
        graft.functions.PqExpressions.pqCodes(cv, books, sub).as("__codes"))
      .select(col("nbr") +:
        (0 until m).map(mi =>
          element_at(col("__codes"), mi + 1).as(s"__code_$mi")): _*)
  }

  /** ADC search over a PRECOMPUTED codes frame ([[pqEncodeCodes]]'s
    * schema): the coarse pass reads only the codes — the stored index
    * state — while `corpus` supplies float vectors for the exact
    * rescore of the surfaced candidates alone.
    */
  def pqSearchWithCodes(
      queries: DataFrame,
      codes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      books: Seq[Seq[(Long, Array[Double])]],
      k: Int,
      refine: Int = 3): DataFrame = {
    require(k > 0 && refine > 0, "k and refine must be positive")
    val m = books.size
    require(m > 0 && dims % m == 0, s"books size $m must divide dims=$dims")
    val sub = dims / m

    // query → LUT of sub-dots + its own norm. The flat layout offsets
    // by ACTUAL book sizes, not ks: Lloyd drops cells that go empty,
    // so a book can come back smaller than ks (both engines shrink it
    // identically — the micro update groups by surviving cid only)
    val offs = books.map(_.size).scanLeft(0)(_ + _)
    val cn2 = typedLit(
      (for (mi <- 0 until m; (_, v) <- books(mi))
        yield v.map(x => x * x).sum).toSeq)
    val q = broadcast(queries
      .select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv")))
      .withColumn("__lut",
        graft.functions.PqExpressions.pqLut(col("__qv"), books, sub))
      .drop("__qv"))

    def idx(mi: Int): Column = lit(offs(mi)) + col(s"__code_$mi") + 1
    val approxDot = (0 until m).map(mi => element_at(col("__lut"), idx(mi)))
      .reduce(_ + _)
    val reconN = sqrt((0 until m).map(mi => element_at(cn2, idx(mi)))
      .reduce(_ + _))
    val coarse = q.join(codes, col("qid") =!= col("nbr"))
      .withColumn("__asim", cosineFromParts(approxDot, col("__qn"), reconN))
      .select(col("qid"), col("nbr"), col("__asim"))
    val cands = graft.plans.TopKPerKey.topk(coarse, Seq("qid"),
        Seq(graft.plans.TopKPerKey.Desc("__asim"),
          graft.plans.TopKPerKey.Asc("nbr")), k * refine)
      .withColumnRenamed("rank", "coarse_rank")
      .select(col("qid"), col("nbr"), col("coarse_rank"))

    // exact rescore of the surfaced candidates only
    val qv = broadcast(queries
      .select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv"))))
    val cExact = corpus
      .select(col(idCol).as("nbr"), toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv")))
    val exact = cExact
      .join(broadcast(cands.join(qv, "qid")), "nbr")
      .withColumn("sim", cosineFromParts(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr"))
    exact
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"), col("coarse_rank"))
  }

  /** Logical DELETE for a stored PQ index: the live view of a codes
    * frame ([[pqEncodeCodes]] schema) minus the tombstoned ids. The
    * index lifecycle a growing corpus with takedowns/dedup-removals
    * needs is append + tombstone + periodic compaction — a physical
    * rewrite of the codes table per delete batch is the anti-pattern
    * (at 100 TB the codes table is the index; a takedown list is a
    * few thousand ids).
    *
    * Shape: one `left_anti` equi-join on the id. A takedown-sized
    * tombstone set broadcasts (AQE picks the broadcast-hash anti
    * join); a mass-removal set degrades gracefully to a shuffled anti
    * join keyed on the id — the plan a full rewrite would pay anyway.
    * The frozen books are not touched: deletion is pure codes-table
    * state, so search results for surviving ids are bit-identical to
    * an index built without the deleted rows ever present (the ADC
    * LUT depends only on books and query).
    *
    * `tombstones`' FIRST column is the id (any name); extra columns
    * (deletion timestamps, reasons) are ignored.
    */
  def pqApplyTombstones(codes: DataFrame, tombstones: DataFrame): DataFrame = {
    require(codes.columns.contains("nbr"), "codes must carry an `nbr` id column")
    val ts = tombstones.select(col(tombstones.columns.head).as("nbr")).distinct()
    codes.join(ts, Seq("nbr"), "left_anti")
  }

  /** [[pqSearchWithCodes]] over a LIVE index view: tombstoned ids are
    * excluded from the coarse ADC pass (they never occupy candidate
    * slots, so surviving neighbours fill the top-k exactly as if the
    * deleted rows were physically gone) and therefore never reach the
    * exact rescore either. The streaming search path composes the
    * same way: stream-encoded codes union stored codes, then this.
    */
  def pqSearchWithTombstones(
      queries: DataFrame,
      codes: DataFrame,
      tombstones: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      books: Seq[Seq[(Long, Array[Double])]],
      k: Int,
      refine: Int = 3): DataFrame =
    pqSearchWithCodes(queries, pqApplyTombstones(codes, tombstones),
      corpus, idCol, vecCol, dims, books, k, refine)

  /** Physical compaction of a stored PQ index: rewrite the parquet
    * codes table at `codesDir` minus the ids tombstoned at
    * `tombstonesDir`, then clear the APPLIED tombstones. The rewrite
    * stages into a sibling directory and swaps by rename (the
    * [[graft.streaming.StreamingCuration.compactState]] pattern):
    * readers see the old table until the swap, the new table after.
    * The swap itself is two renames, so there is a narrow crash
    * window in which `codesDir` is absent while the `__old` sibling
    * holds the intact pre-compaction table; re-running self-heals by
    * renaming `__old` back before proceeding, so any restart
    * converges. A crash AFTER the swap but before the tombstone clear
    * leaves already-applied tombstones in place; re-running is a
    * no-op rewrite (anti join of absent ids), so compaction is
    * idempotent.
    *
    * Tombstone writers (e.g. the [[graft.streaming.StreamingIndexIngest
    * .tombstoneStream]] sink) may keep APPENDING during compaction:
    * the tombstone FILE LIST is snapshotted once at read time, the
    * anti join applies exactly those files, and only those files are
    * deleted afterwards — a tombstone file landing mid-compaction
    * survives untouched and is applied by the next live-view search /
    * compaction cycle. Only `codesDir` ingest appends must quiesce
    * (rows appended there mid-rewrite would be dropped by the swap).
    *
    * Also the small-file maintenance for streaming ingest: every
    * micro-batch appends a file set, and `numFiles` bounds what
    * subsequent searches re-plan over. Returns the live row count of
    * the compacted table.
    */
  def pqCompactIndex(
      spark: SparkSession,
      codesDir: String,
      tombstonesDir: String,
      numFiles: Int = 1): Long = {
    import org.apache.hadoop.fs.Path
    require(numFiles >= 1, "numFiles must be positive")
    val dir = new Path(codesDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // siblings via (parent, name) — a trailing slash would make these
    // children of the directory being renamed and the swap would fail
    def sibling(suffix: String) =
      new Path(dir.getParent, dir.getName + suffix)
    val staged = sibling("__compacting")
    val old = sibling("__old")
    // self-heal the swap's crash window: a previous run that died
    // between rename(dir → __old) and rename(staged → dir) left no
    // codes table but an intact __old — restore it and proceed
    if (!fs.exists(dir) && fs.exists(old)) {
      if (!fs.rename(old, dir))
        throw new java.io.IOException(
          s"pqCompactIndex: could not restore $old to $codesDir")
    }
    val tombDir = new Path(tombstonesDir)
    // snapshot the tombstone DATA FILE list now: concurrent appends
    // land new files, which we must neither apply-then-forget nor
    // delete unapplied — everything below touches only this snapshot
    val tombFiles: Seq[Path] =
      if (fs.exists(tombDir)) {
        val entries = fs.listStatus(tombDir).toSeq
          .filterNot { st =>
            val n = st.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
        // the snapshot-then-delete contract is defined over a FLAT
        // tombstone table (the tombstoneStream sink's layout). A
        // partitioned writer would put its data files in
        // subdirectories, which a flat listing would silently never
        // apply — they would survive compaction undeleted while the
        // compacted codes table keeps their rows, diverging from the
        // live-view read (which reads the whole directory tree). Fail
        // fast rather than half-apply.
        val dirs = entries.filter(_.isDirectory)
        if (dirs.nonEmpty) throw new java.io.IOException(
          s"pqCompactIndex: tombstone table $tombstonesDir contains " +
            s"subdirectories (${dirs.map(_.getPath.getName).mkString(", ")}) — " +
            "tombstone tables must be flat; a partitioned tombstone " +
            "writer is not supported by compaction")
        entries.filter(_.isFile).map(_.getPath)
      } else Seq.empty
    val codes = spark.read.parquet(codesDir)
    val live =
      if (tombFiles.nonEmpty)
        pqApplyTombstones(codes,
          spark.read.parquet(tombFiles.map(_.toString): _*))
      else codes
    if (fs.exists(staged)) fs.delete(staged, true)
    live.coalesce(numFiles).write.parquet(staged.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"pqCompactIndex: could not stage out $codesDir")
    if (!fs.rename(staged, dir)) {
      // restore the original before failing — all-or-nothing swap
      fs.rename(old, dir)
      throw new java.io.IOException(s"pqCompactIndex: could not swap in $staged")
    }
    fs.delete(old, true)
    // the snapshotted tombstones are now physically applied: clear
    // exactly those files so the next live view stops paying the anti
    // join for them, while files appended since the snapshot survive
    tombFiles.foreach(p => fs.delete(p, false))
    // retire the dir only if nothing but writer markers remain; the
    // final delete is NON-recursive, so it atomically fails (dir kept)
    // if a concurrent append lands between the listing and the delete
    if (tombFiles.nonEmpty && fs.exists(tombDir)) {
      val rest = fs.listStatus(tombDir).toSeq
      if (rest.forall(st => st.isFile && {
            val n = st.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          })) {
        rest.foreach(st => fs.delete(st.getPath, false))
        try fs.delete(tombDir, false)
        catch { case _: java.io.IOException => () }
      }
    }
    spark.read.parquet(codesDir).count()
  }

  // ---------------------------------------------------------------
  // Stored IVF-PQ index: on-disk layout + atomic split commit
  // ---------------------------------------------------------------

  /** Layout of a STORED two-layer index under `indexDir`:
    *   - `centroids`: tiny parquet `(cell long, vec array<double>)` —
    *     the coarse quantizer, replaced atomically by rename on every
    *     structural change (the [[pqCompactIndex]] swap pattern);
    *   - `codes`: the [[ivfPqEncodeCellCodes]] table written
    *     PARTITIONED BY `cell`, so each inverted list is its own
    *     directory and structural maintenance (a hot-cell split, a
    *     list drop) is partition surgery bounded by the touched
    *     cells — never a full-table rewrite. At 100 TB the codes
    *     table IS the index; rewriting it to relabel two cells is
    *     the anti-pattern the partitioning exists to avoid.
    */
  private def ivfCentsDir(indexDir: String): String = s"$indexDir/centroids"
  def ivfCodesDir(indexDir: String): String = s"$indexDir/codes"

  /** Initial build of a stored index: codes partitioned by cell,
    * centroids swapped in last (readers resolve the index through the
    * centroid table, so a half-written codes table is unreachable).
    */
  def ivfWriteIndex(
      spark: SparkSession,
      indexDir: String,
      cents: Seq[(Long, Array[Double])],
      cellCodes: DataFrame): Unit = {
    require(cents.nonEmpty, "empty centroid set")
    require(cents.map(_._1).distinct.size == cents.size, "duplicate centroid ids")
    cellCodes.write.mode("overwrite").partitionBy("cell")
      .parquet(ivfCodesDir(indexDir))
    writeCentroidsSwap(spark, indexDir, cents)
  }

  /** The stored coarse quantizer, self-healing the swap's crash
    * window exactly like [[pqCompactIndex]]'s codes rename.
    */
  def ivfReadCentroids(
      spark: SparkSession, indexDir: String): Seq[(Long, Array[Double])] = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(ivfCentsDir(indexDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir.getParent, dir.getName + "__old")
    if (!fs.exists(dir) && fs.exists(old)) {
      if (!fs.rename(old, dir)) throw new java.io.IOException(
        s"ivfReadCentroids: could not restore $old to $dir")
    }
    spark.read.parquet(dir.toString)
      .select(col("cell"), col("vec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
  }

  private def writeCentroidsSwap(
      spark: SparkSession,
      indexDir: String,
      cents: Seq[(Long, Array[Double])]): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(ivfCentsDir(indexDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sibling(suffix: String) = new Path(dir.getParent, dir.getName + suffix)
    val staged = sibling("__staging")
    val old = sibling("__old")
    if (fs.exists(staged)) fs.delete(staged, true)
    import spark.implicits._
    cents.toDF("cell", "vec").coalesce(1).write.parquet(staged.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new java.io.IOException(s"writeCentroidsSwap: could not stage out $dir")
    if (!fs.rename(staged, dir)) {
      if (fs.exists(old)) fs.rename(old, dir)
      throw new java.io.IOException(s"writeCentroidsSwap: could not swap in $staged")
    }
    fs.delete(old, true)
  }

  /** Write-back of an [[ivfSplitHotCells]] result into the STORED
    * index — the missing half of the split at production scale: the
    * in-memory [[HotSplit]] is advisory until the stored artifact
    * reflects it, because streaming ingest
    * ([[graft.streaming.StreamingIndexIngest.encodeCellStream]]) and
    * every search resolve cells through the stored centroids.
    *
    * Work is bounded by the hot cells' members — cold inverted lists
    * (their directories, their rows, their centroid entries) are
    * never read or written. Because parquet partitions cannot be
    * relabeled in place, the commit does NOT adopt the HotSplit's
    * dense `cid*kSplit` labeling (that would rewrite every cold
    * partition's directory name); instead cold cells keep their
    * stored ids and each hot cell's kSplit sub-centroids get FRESH
    * ids above the stored maximum — deterministic
    * (`max+1 + hotRank*kSplit + sub`), collision-free, and
    * search-equivalent (ranking never depends on cell labels).
    *
    * Commit sequence and crash windows:
    *   1. the hot members' existing code rows are re-written under
    *      their new sub-cell partitions (a join of the assignment
    *      against ONLY the hot partitions — PQ codes are label-
    *      independent, so codes are copied, never re-encoded), via
    *      dynamic partition overwrite: idempotent, and invisible to
    *      readers (no stored centroid carries a fresh id yet);
    *   2. the centroid table is atomically swapped to (cold ids +
    *      fresh sub ids) — THE commit point: from here every
    *      assignment, search probe, and streamed ingest row resolves
    *      against the split layout, and the old hot partitions are
    *      unreachable (no centroid has their id, so no probe and no
    *      new row can land there);
    *   3. the orphaned hot partitions are deleted — pure GC; a crash
    *      before it leaves unreachable rows that only cost storage,
    *      and re-running the commit detects the already-swapped
    *      centroids and finishes the GC.
    *
    * Returns the committed centroid set (what callers feed to
    * searches and the streaming encode).
    */
  def ivfCommitSplit(
      spark: SparkSession,
      indexDir: String,
      split: HotSplit,
      idCol: String,
      kSplit: Int): Seq[(Long, Array[Double])] = {
    import org.apache.hadoop.fs.Path
    require(kSplit >= 2, "kSplit must match the split's")
    val codesDir = ivfCodesDir(indexDir)
    val fs = new Path(codesDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hotDirs = split.hotCells.map(c => new Path(codesDir, s"cell=$c"))
    val stored = ivfReadCentroids(spark, indexDir)
    val storedIds = stored.map(_._1).toSet
    if (split.hotCells.isEmpty) return stored
    if (split.hotCells.forall(c => !storedIds.contains(c))) {
      // already committed (a prior run crashed between the centroid
      // swap and the GC): finish the GC and return the stored state
      hotDirs.foreach(d => if (fs.exists(d)) fs.delete(d, true))
      return stored
    }
    require(split.hotCells.forall(storedIds.contains),
      s"ivfCommitSplit: split's hot cells ${split.hotCells} are not all " +
        s"present in the stored centroid table at $indexDir — the split " +
        "must be derived from this index's stored centroids")

    val maxOld = stored.map(_._1).max
    val hotSorted = split.hotCells.sorted
    val baseByCell: Map[Long, Long] = hotSorted.zipWithIndex.map {
      case (c, i) => c -> (maxOld + 1L + i.toLong * kSplit)
    }.toMap

    // 1. hot members' rows under their new partitions. Reading ONLY
    // the hot partition dirs keeps the scan bounded by what splits;
    // the inner join against the assignment is the relabel.
    val hotCodes = spark.read
      .option("basePath", codesDir)
      .parquet(hotDirs.map(_.toString): _*)
    val oldCell = expr(s"cluster div $kSplit")
    val relabel = baseByCell.foldLeft(lit(null).cast("long")) {
      case (acc, (c, b)) =>
        when(oldCell === c, lit(b) + expr(s"cluster % $kSplit")).otherwise(acc)
    }
    val newAssign = split.assignment
      .filter(oldCell.isin(hotSorted: _*))
      .select(col(idCol).as("nbr"), relabel.as("__newcell"))
    val codeCols = hotCodes.columns.filter(_.startsWith("__code_")).sorted
    hotCodes.join(newAssign, "nbr")
      .select(col("nbr") +: codeCols.map(col) :+ col("__newcell").as("cell"): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(codesDir)

    // 2. atomic centroid swap: cold ids untouched, hot replaced by
    // their sub-centroids under fresh ids. HotSplit labels are
    // cid*kSplit(+sub); map cold back to the stored id, subs to fresh.
    val hotSet = split.hotCells.toSet
    val committed = split.cents.map { case (id, v) =>
      val c = id / kSplit
      if (hotSet(c)) (baseByCell(c) + id % kSplit, v) else (c, v)
    }.sortBy(_._1)
    writeCentroidsSwap(spark, indexDir, committed)

    // 3. GC the orphaned hot partitions
    hotDirs.foreach(d => if (fs.exists(d)) fs.delete(d, true))
    committed
  }

  /** [[ivfPqTopKWithIndex]] over the LIVE view: tombstoned ids drop
    * out of the corpus side BEFORE cell assignment and encoding, so
    * deleted rows never occupy a cell's candidate slots and never
    * reach the rescore — the IVF composition of the same one-anti-join
    * delete semantics as [[pqSearchWithTombstones]], against the same
    * frozen cents/books. `tombstones`' first column is the id.
    */
  def ivfPqTopKWithTombstones(
      queries: DataFrame,
      corpus: DataFrame,
      tombstones: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]],
      nProbe: Int,
      k: Int,
      refine: Int = 3): DataFrame = {
    val ts = tombstones.select(col(tombstones.columns.head).as(idCol)).distinct()
    ivfPqTopKWithIndex(queries, corpus.join(ts, Seq(idCol), "left_anti"),
      idCol, vecCol, dims, cents, books, nProbe, k, refine)
  }

  /** IVF-PQ: the FAISS-style composition of the two index layers —
    * a coarse IVF cell probe confines the search to `nProbe` of
    * `nCells` inverted lists, and WITHIN the probed cells the ranking
    * is PQ-ADC (LUT lookups against the corpus codes), never a
    * full-width dot, with an exact rescore of the surfaced
    * `k·refine` candidates.
    *
    * Why the composition matters at 100 TB: flat PQ ([[pqTopK]])
    * still streams EVERY code — linear per query. The cell probe cuts
    * the coarse pass to an expected `nProbe/nCells` of the corpus,
    * and in Spark terms turns the query×corpus crossing into an
    * EQUI-JOIN on the cell id (broadcast-hash on the tiny probe
    * side), so the corpus codes frame is filtered by join key, not
    * scanned per query. Both index layers train with the exact
    * micro-unit Lloyd, so the DuckDB oracle reproduces cells, codes,
    * and ADC ranks bit-for-bit. PQ books are trained on the RAW
    * vectors (not cell residuals) — the residual refinement is a
    * recall optimization, not a semantic requirement, and raw-vector
    * books keep the codes independent of the cell layer.
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int,
      ks: Int,
      pqIters: Int,
      nCells: Int,
      ivfIters: Int,
      nProbe: Int,
      k: Int,
      refine: Int = 3): DataFrame =
    ivfPqTopKWithIndex(queries, corpus, idCol, vecCol, dims,
      kmeansCentroids(corpus, idCol, vecCol, nCells, ivfIters),
      pqCodebooks(corpus, idCol, vecCol, dims, m, ks, pqIters),
      nProbe, k, refine)

  /** [[ivfPqTopK]] against a PRE-TRAINED index (coarse cells + PQ
    * books) — see [[pqTopKWithBooks]] for why the trained artifact is
    * a first-class input.
    */
  def ivfPqTopKWithIndex(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]],
      nProbe: Int,
      k: Int,
      refine: Int = 3): DataFrame =
    ivfPqSearchWithCellCodes(queries,
      ivfPqEncodeCellCodes(corpus, idCol, vecCol, dims, cents, books),
      corpus, idCol, vecCol, dims, cents, books, nProbe, k, refine)

  /** The two-layer index encode as ONE stateless projection: each row
    * gets its coarse IVF cell (nearest stored centroid) AND its m PQ
    * codes against the frozen books — `(nbr, cell, __code_0..)`, the
    * stored-table schema [[ivfPqSearchWithCellCodes]] consumes. Pure
    * projection (centroids and books ride as codegen reference
    * objects), so it runs identically on a batch frame and a
    * streaming frame — the streaming ingest path
    * ([[graft.streaming.StreamingIndexIngest.encodeCellStream]]) is
    * literally this function applied to a stream.
    */
  def ivfPqEncodeCellCodes(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame = {
    val m = books.size
    require(m > 0 && dims % m == 0, s"books size $m must divide dims=$dims")
    require(cents.nonEmpty, "empty centroid set")
    val sub = dims / m
    cellAssign(df, idCol, vecCol, cents, "nbr", "__cv0", "__cn0", probes = 1)
      .withColumn("__codes",
        graft.functions.PqExpressions.pqCodes(col("__cv0"), books, sub))
      .select(col("nbr") +: col("__cell").as("cell") +:
        (0 until m).map(mi =>
          element_at(col("__codes"), mi + 1).as(s"__code_$mi")): _*)
  }

  /** [[ivfPqTopKWithIndex]] over a STORED `(nbr, cell, codes)` table
    * ([[ivfPqEncodeCellCodes]] schema) instead of re-encoding the
    * corpus — the search path for an index whose rows arrived by
    * batch build, incremental ingest, or the streaming encode (their
    * outputs union directly: one encode implementation). `corpus`
    * supplies raw vectors for the exact rescore of surfaced
    * candidates only.
    */
  def ivfPqSearchWithCellCodes(
      queries: DataFrame,
      cellCodes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]],
      nProbe: Int,
      k: Int,
      refine: Int = 3): DataFrame = {
    require(k > 0 && refine > 0 && nProbe > 0, "k, refine, nProbe must be positive")
    require(cellCodes.columns.contains("nbr") && cellCodes.columns.contains("cell"),
      "cellCodes must carry nbr and cell columns")
    val m = books.size
    require(m > 0 && dims % m == 0, s"books size $m must divide dims=$dims")
    val sub = dims / m
    val offs = books.map(_.size).scanLeft(0)(_ + _)
    val corpusSide = cellCodes.withColumnRenamed("cell", "__cell")

    val cn2 = typedLit(
      (for (mi <- 0 until m; (_, v) <- books(mi))
        yield v.map(x => x * x).sum).toSeq)
    val q = broadcast(cellAssign(queries, idCol, vecCol, cents,
        "qid", "__qv", "__qn", probes = nProbe)
      .withColumn("__lut",
        graft.functions.PqExpressions.pqLut(col("__qv"), books, sub))
      .select(col("qid"), col("__qn"), col("__lut"), col("__cell")))

    def idx(mi: Int): Column = lit(offs(mi)) + col(s"__code_$mi") + 1
    val approxDot = (0 until m).map(mi => element_at(col("__lut"), idx(mi)))
      .reduce(_ + _)
    val reconN = sqrt((0 until m).map(mi => element_at(cn2, idx(mi)))
      .reduce(_ + _))
    // equi-join on the probed cell: only nProbe/nCells of the code
    // frame ever meets a query
    val coarse = q.join(corpusSide, Seq("__cell"))
      .filter(col("qid") =!= col("nbr"))
      .withColumn("__asim", cosineFromParts(approxDot, col("__qn"), reconN))
      .select(col("qid"), col("nbr"), col("__asim"))
    val cands = graft.plans.TopKPerKey.topk(coarse, Seq("qid"),
        Seq(graft.plans.TopKPerKey.Desc("__asim"),
          graft.plans.TopKPerKey.Asc("nbr")), k * refine)
      .withColumnRenamed("rank", "coarse_rank")
      .select(col("qid"), col("nbr"), col("coarse_rank"))

    val qv = broadcast(queries
      .select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv"))))
    val cExact = corpus
      .select(col(idCol).as("nbr"), toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv")))
    val exact = cExact
      .join(broadcast(cands.join(qv, "qid")), "nbr")
      .withColumn("sim", cosineFromParts(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nbr"))
    exact
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nbr"), col("sim"), col("coarse_rank"))
  }

  /** Result of [[ivfSplitHotCells]]: the rebalanced centroid table,
    * the hot cells that were split, the bounded re-assignment, and a
    * release hook for the working-set checkpoint backing `assignment`
    * (call it once the assignment is consumed; the suite's cache
    * scrub would otherwise strand the truncated lineage).
    *
    * Centroid ids are relabeled `cid·kSplit (+ sub)` — deterministic,
    * collision-free, and `cluster div kSplit` recovers the
    * pre-split cell of any assigned row.
    */
  final case class HotSplit(
      cents: Seq[(Long, Array[Double])],
      hotCells: Seq[Long],
      assignment: DataFrame,
      release: () => Unit)

  /** Most hot cells one [[ivfSplitHotCells]] pass may split: the
    * per-cell sub-assignment is a single folded projection whose
    * plan/codegen size grows with hot.size * kSplit * dims, the same
    * wall [[QualityClassifier.MaxLinearVocab]] guards for the linear
    * scorer. Named so callers hit a diagnosable error, never a Janino
    * failure deep in codegen.
    */
  val MaxHotCellSplits: Int = 64

  /** Hot-cell remediation for a stored IVF cell layer — the action
    * the q170 health report prices: when a cell's occupancy exceeds
    * `hotPpm` (parts-per-million of the MEAN cell size; 2e6 = twice
    * the mean), split it by training `kSplit` sub-centroids on that
    * cell's members ONLY and redistribute exactly those members among
    * them. FAISS rebalances skewed IVF lists the same way; here it is
    * relational end-to-end.
    *
    * Why bounded re-encode is the whole point at 100 TB: a skewed
    * cell makes every probe that hits it pay `imbalance`× the mean
    * list length, but a full re-train + re-assign rewrites the ENTIRE
    * index. This touches only the hot cells' rows — cold cells keep
    * their centroid, their members, and their stored codes verbatim
    * (PQ codes are trained on raw vectors, independent of the cell
    * layer, so a split never re-encodes codes at all — only the cell
    * ids of the hot rows change).
    *
    * Mechanics mirror the global trainer exactly (same seeds-by-
    * lowest-id init, same exact micro-unit Lloyd updates, same
    * sim-DESC/lower-id/NaN-first assignment rules), but grouped by
    * cell: each iteration is ONE pass over the hot members — a pure
    * projection (per-cell sub-centroids ride as codegen literals)
    * plus one partial-agged shuffle of (cell, sub, dim) rows; the
    * collected gradient is `nHot·kSplit·dims` longs, driver-bounded
    * by construction. Assignment of a member considers only ITS
    * OWN cell's sub-centroids (the split is local — FAISS's list
    * split, not a global re-quantization).
    */
  def ivfSplitHotCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      hotPpm: Long = 2000000L,
      kSplit: Int = 2,
      iters: Int = 2): HotSplit = {
    require(cents.nonEmpty, "empty centroid set")
    require(kSplit >= 2, "kSplit must split into at least 2 sub-cells")
    require(iters >= 0 && hotPpm > 0, "iters non-negative, hotPpm positive")
    val e = df
      .select(col(idCol).as("__id"), toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__n", l2Norm(col("__v")))
    // one stored-quantizer assignment pass, checkpointed: the Lloyd
    // loop below re-reads only the hot slice of it
    val assigned = kmeansAssigned(e, cents)
      .select(col("__id"), col("__v"), col("__cid"))
      .withColumn("__n", l2Norm(col("__v")))
      .localCheckpoint()
    val occ = assigned.groupBy(col("__cid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nVecs = occ.values.sum
    val nCells = occ.size.toLong
    // exact integer rule in BigInt — n·nCells·1e6 would wrap Long at
    // ~1e13-row cells, exactly the corpora this exists for
    val hot = occ.collect {
      case (c, n) if BigInt(n) * nCells * 1000000L > BigInt(hotPpm) * nVecs => c
    }.toSeq.sorted
    // the per-cell sub-assignment folds each hot cell's sub-centroids
    // into ONE projection (a when/otherwise chain with a
    // centroidCosines node + kSplit comparator structs per cell), so
    // plan/codegen size is linear in hot.size * kSplit * dims — past a
    // few dozen cells that hits the same Janino/plan-size wall
    // trainLinear's MaxLinearVocab guards. Fail with a named cap
    // instead: raise hotPpm (split only the genuinely hottest cells)
    // or remediate in multiple passes.
    require(hot.size <= MaxHotCellSplits,
      s"ivfSplitHotCells: ${hot.size} cells exceed hotPpm=$hotPpm, over " +
        s"the $MaxHotCellSplits-cells-per-pass codegen cap — raise hotPpm " +
        "or split in multiple passes")
    val release = () =>
      org.apache.spark.sql.graftbridge.unpersistCheckpointed(assigned)

    if (hot.isEmpty) {
      val assignment = assigned
        .select(col("__id").as(idCol),
          (col("__cid") * kSplit).as("cluster"))
      return HotSplit(
        cents.map { case (c, v) => (c * kSplit, v) }.sortBy(_._1),
        Nil, assignment, release)
    }

    val hotSet = hot.toSet
    val mem = assigned.filter(col("__cid").isin(hot: _*))

    // per-cell sub-assignment: argmax cosine among the row's OWN
    // cell's sub-centroids — same comparator structs as the global
    // assignment (sim DESC, ties to the lower sub id, NaN first)
    def subAssign(subs: Map[Long, Seq[(Long, Array[Double])]]): Column =
      subs.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
        case (acc, (c, sc)) =>
          val sims = graft.functions.PqExpressions
            .centroidCosines(col("__v"), col("__n"), sc)
          val entries = sc.zipWithIndex.map { case ((j, _), i) =>
            val s = element_at(sims, i + 1)
            struct(
              when(isnan(s), lit(Double.NegativeInfinity))
                .otherwise(-s).as("negsim"),
              lit(j).as("cid"))
          }
          when(col("__cid") === c,
            array_min(array(entries: _*)).getField("cid")).otherwise(acc)
      }

    // init: the kSplit lowest-id members of each hot cell (the global
    // trainer's lowest-id convention, per cell)
    val wSeed = Window.partitionBy("__cid").orderBy("__id")
    var subs: Map[Long, Seq[(Long, Array[Double])]] = mem
      .withColumn("__rn", row_number().over(wSeed))
      .filter(col("__rn") <= kSplit)
      .select(col("__cid"), (col("__rn") - 1).cast("long").as("__sub"), col("__v"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (c, rs) =>
        c -> rs.map(r => r.getLong(1) -> r.getSeq[Double](2).toArray)
          .sortBy(_._1).toSeq
      }
    for (_ <- 1 to iters) {
      val micro = mem.withColumn("__sub", subAssign(subs))
        .select(col("__cid"), col("__sub"),
          posexplode(col("__v")).as(Seq("dim", "x")))
        .withColumn("__m", round(round(col("x"), 6) * 1e6).cast("long"))
        .groupBy(col("__cid"), col("__sub"), col("dim"))
        .agg(sum(col("__m")).as("__s"), count(lit(1)).as("__cnt"))
        .select(col("__cid"), col("__sub"), col("dim"),
          (when(col("__s") < 0, -1L).otherwise(1L) *
            expr("(2 * abs(__s) + __cnt) div (2 * __cnt)")).as("cm"))
        .collect()
      subs = micro
        .groupBy(_.getLong(0))
        .map { case (c, rs) =>
          c -> rs.groupBy(_.getLong(1))
            .map { case (j, ds) =>
              j -> ds.sortBy(_.getInt(2)).map(_.getLong(3).toDouble / 1e6).toArray
            }
            .toSeq.sortBy(_._1)
        }
    }

    val assignment = assigned
      .withColumn("cluster",
        col("__cid") * kSplit +
          when(col("__cid").isin(hot: _*), subAssign(subs)).otherwise(lit(0L)))
      .select(col("__id").as(idCol), col("cluster"))
    val newCents =
      (cents.collect { case (c, v) if !hotSet(c) => (c * kSplit, v) } ++
        subs.toSeq.flatMap { case (c, sc) =>
          sc.map { case (j, v) => (c * kSplit + j, v) }
        }).sortBy(_._1)
    HotSplit(newCents, hot, assignment, release)
  }

  /** Recall-vs-nProbe sweep for a stored IVF-PQ index: measure
    * recall@k of [[ivfPqTopKWithIndex]] against the exact
    * ([[bruteForceTopK]]) ground truth at EVERY probe width in
    * `nProbes`, in one pass — the report that turns a target recall
    * into an nProbe setting (the q95 evaluation applied to the
    * cell-probed index; FAISS tunes nprobe the same way, by sweeping
    * against exact results on a query sample).
    *
    * Cost shape — the whole sweep pays ONE index pass, not one per
    * sweep point: a query's probe list at nProbe=p is a PREFIX of its
    * list at max(nProbes) (cells are rank-ordered by query-to-centroid
    * similarity), so the coarse ADC join runs once at the widest
    * setting carrying the probe rank, and each sweep point is a
    * filter (`probe_rank <= p`) + per-(p, query) top-k over that one
    * join's output. The exact rescore dots are computed once per
    * DISTINCT surfaced (query, neighbor) pair across all sweep
    * points (wider probes mostly re-surface the same candidates).
    * Ground truth is one brute-force pass over the query sample —
    * the calibration cost a sample bounds by construction; never run
    * it over the full query log.
    *
    * Output, one row per sweep point: `(n_probe, n_queries, hits,
    * possible, recall_ppm)` — hits = ANN∩exact top-k pairs, possible
    * = exact top-k pairs, recall in exact integer ppm (the q168/q170
    * health-report convention), so the report is engine-portable with
    * no float compare.
    */
  def ivfPqRecallSweep(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]],
      nProbes: Seq[Int],
      k: Int,
      refine: Int = 3): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ > 0), "nProbes must be positive")
    require(k > 0 && refine > 0, "k and refine must be positive")
    require(cents.nonEmpty, "empty centroid set")
    val m = books.size
    require(m > 0 && dims % m == 0, s"books size $m must divide dims=$dims")
    val sub = dims / m
    val offs = books.map(_.size).scanLeft(0)(_ + _)
    val probes = nProbes.distinct.sorted.map(_.toLong)
    val maxProbe = probes.last.toInt

    // corpus → (id, cell, m codes): the stored-index view, computed once
    val corpusSide =
      ivfPqEncodeCellCodes(corpus, idCol, vecCol, dims, cents, books)
        .withColumnRenamed("cell", "__cell")

    // queries with PROBE RANK: one assignment at maxProbe serves every
    // sweep point (same comparator structs as cellAssign — similarity
    // DESC, ties to the lower cell id, NaN to -Infinity)
    val eq = queries
      .select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv")))
    val sims =
      graft.functions.PqExpressions.centroidCosines(col("__qv"), col("__qn"), cents)
    val entries = cents.zipWithIndex.map { case ((cid, _), i) =>
      val s = element_at(col("__sims"), i + 1)
      struct(
        when(isnan(s), lit(Double.NegativeInfinity)).otherwise(-s).as("negsim"),
        lit(cid).as("cid"))
    }
    val q = broadcast(eq
      .withColumn("__sims", sims)
      .withColumn("__lut",
        graft.functions.PqExpressions.pqLut(col("__qv"), books, sub))
      .select(col("qid"), col("__qn"), col("__lut"),
        posexplode(transform(
          slice(array_sort(array(entries: _*)), 1, maxProbe),
          s => s.getField("cid"))).as(Seq("__pr0", "__cell")))
      .select(col("qid"), col("__qn"), col("__lut"), col("__cell"),
        (col("__pr0") + 1).cast("long").as("__probe_rank")))

    val cn2 = typedLit(
      (for (mi <- 0 until m; (_, v) <- books(mi))
        yield v.map(x => x * x).sum).toSeq)
    def idx(mi: Int): Column = lit(offs(mi)) + col(s"__code_$mi") + 1
    val approxDot = (0 until m).map(mi => element_at(col("__lut"), idx(mi)))
      .reduce(_ + _)
    val reconN = sqrt((0 until m).map(mi => element_at(cn2, idx(mi)))
      .reduce(_ + _))
    // ONE coarse ADC equi-join at the widest probe setting; a corpus
    // row lives in exactly one cell, so (qid, nbr) appears at most once
    val coarse = q.join(corpusSide, Seq("__cell"))
      .filter(col("qid") =!= col("nbr"))
      .withColumn("__asim", cosineFromParts(approxDot, col("__qn"), reconN))
      .select(col("qid"), col("__probe_rank"), col("nbr"), col("__asim"))

    // sweep expansion: each point re-ranks the one join's output under
    // its prefix filter — no second pass over the index
    val expanded = coarse
      .withColumn("n_probe", explode(typedLit(probes)))
      .filter(col("__probe_rank") <= col("n_probe"))
    val cands = graft.plans.TopKPerKey.topk(expanded, Seq("n_probe", "qid"),
        Seq(graft.plans.TopKPerKey.Desc("__asim"),
          graft.plans.TopKPerKey.Asc("nbr")), k * refine)
      .select(col("n_probe"), col("qid"), col("nbr"))

    // exact rescore once per DISTINCT surfaced pair, joined back to
    // every sweep point that surfaced it
    val qv = broadcast(queries
      .select(col(idCol).as("qid"), toDoubleArray(col(vecCol)).as("__qv"))
      .withColumn("__qn", l2Norm(col("__qv"))))
    val cExact = corpus
      .select(col(idCol).as("nbr"), toDoubleArray(col(vecCol)).as("__cv"))
      .withColumn("__cn", l2Norm(col("__cv")))
    val pairSims = cExact
      .join(broadcast(cands.select("qid", "nbr").distinct().join(qv, "qid")), "nbr")
      .withColumn("sim",
        cosineFromParts(dot(col("__qv"), col("__cv")), col("__qn"), col("__cn")))
      .select(col("qid"), col("nbr"), col("sim"))
    val wAnn = Window.partitionBy("n_probe", "qid")
      .orderBy(col("sim").desc, col("nbr"))
    val annTop = cands.join(pairSims, Seq("qid", "nbr"))
      .withColumn("rank", row_number().over(wAnn))
      .filter(col("rank") <= k)
      .select(col("n_probe"), col("qid"), col("nbr"))

    val gt = bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .select(col("qid"), col("nbr"))
    val totals = gt.agg(count(lit(1)).as("possible"),
      countDistinct(col("qid")).as("n_queries"))
    val hits = annTop.join(gt, Seq("qid", "nbr"), "left_semi")
      .groupBy(col("n_probe")).agg(count(lit(1)).as("hits"))
    // report every requested sweep point, zero-hit points included
    corpus.sparkSession.range(1)
      .select(explode(typedLit(probes)).as("n_probe"))
      .join(hits, Seq("n_probe"), "left")
      .crossJoin(broadcast(totals))
      .select(
        col("n_probe"),
        col("n_queries"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("possible"),
        expr("coalesce(hits, 0) * 1000000 div possible").as("recall_ppm"))
      .orderBy("n_probe")
  }

  /** Probe-width SELECTION from the sweep: the minimum swept `nProbe`
    * whose exact-ppm recall meets `targetRecallPpm`, falling back to
    * the widest swept setting when none does (the sweep told you the
    * index can't hit the target — searching wider than you measured
    * would deploy an unmeasured setting). Collects one bounded row
    * per sweep point — the q176 pattern (a bounded driver step
    * between two distributed jobs) applied to the ANN knob.
    */
  def selectNProbe(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]],
      nProbes: Seq[Int],
      k: Int,
      refine: Int,
      targetRecallPpm: Long): Int = {
    val sweep = ivfPqRecallSweep(queries, corpus, idCol, vecCol, dims,
        cents, books, nProbes, k, refine)
      .select(col("n_probe"), col("recall_ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pickProbe(sweep.toSeq, targetRecallPpm)
  }

  /** The pure selection rule of [[selectNProbe]], unit-tested in
    * isolation: smallest probe meeting the target, else the widest
    * measured one.
    */
  private[graft] def pickProbe(
      sweep: Seq[(Long, Long)], targetRecallPpm: Long): Int = {
    require(sweep.nonEmpty, "empty sweep")
    val meeting = sweep.collect { case (np, rec) if rec >= targetRecallPpm => np }
    (if (meeting.nonEmpty) meeting.min else sweep.map(_._1).max).toInt
  }

  /** Persist an [[ivfPqRecallSweep]] as a STORED selection artifact —
    * the ANN twin of [[QualityClassifier.writeGateSelection]]: the
    * recall-vs-cost measurement lives next to the index's centroid and
    * codebook tables, and the deployed probe width is read from it at
    * search-config time, so re-measuring the sweep (fresh queries, a
    * re-trained index) re-tunes every consumer with no code change.
    */
  def writeProbeSweep(sweep: DataFrame, path: String): Unit =
    sweep.coalesce(1).write.mode("overwrite").parquet(path)

  /** The deployed probe width read from a stored sweep artifact:
    * [[pickProbe]]'s rule (minimum measured probe meeting the recall
    * target, else the widest MEASURED one — never an unmeasured
    * setting) re-derived from the stored `(n_probe, recall_ppm)` rows,
    * never from a frozen flag, so edited measurements change the
    * selection. One bounded collect of an artifact-sized table.
    */
  def readSelectedNProbe(
      spark: SparkSession, path: String, targetRecallPpm: Long): Int = {
    val rows = spark.read.parquet(path)
      .select(col("n_probe"), col("recall_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    pickProbe(rows, targetRecallPpm)
  }
}
