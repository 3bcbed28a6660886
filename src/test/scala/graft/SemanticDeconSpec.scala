package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-4 extension: semantic (embedding-space) decontamination
  * (q119) — cosine-threshold flags against an eval set.
  */
class SemanticDeconSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("flags corpus vectors near any eval vector, counts hits") {
    val evalSet = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f)),   // parallel to eval 1 only
      (11L, Array(1.0f, 1.0f)),   // cos ~0.7071 to both
      (12L, Array(-1.0f, 0.0f))). // anti-parallel / orthogonal: clean
      toDF("vec_id", "embedding")

    val got = Similarity.semanticContamination(
        evalSet, corpus, "vec_id", "embedding", threshold = 0.5)
      .orderBy("cid")
      .as[(Long, Long, Double, Long)].collect().toSeq

    assert(got == Seq(
      (10L, 1L, 1.0, 1L),
      (11L, 2L, 0.70711, 1L)))
  }

  test("blocked path: SRP equi-join, no broadcast/nested-loop, subset semantics") {
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(d => math.sin(seed * 31 + d * 7).toFloat)
    val evalSet = (0L until 6L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val corpus = (100L until 160L).map { i =>
      // half the corpus copies an eval vector (guaranteed same bucket,
      // cos = 1); the rest is pseudo-random
      val v = if (i % 2 == 0) vec(((i / 2) % 6).toInt) else vec(i.toInt)
      (i, v)
    }.toDF("vec_id", "embedding")

    val blocked = Similarity.semanticContamination(
      evalSet, corpus, "vec_id", "embedding", threshold = 0.9,
      evalBroadcast = false, srpBits = 3, dims = dims)
    val exact = Similarity.semanticContamination(
      evalSet, corpus, "vec_id", "embedding", threshold = 0.9)

    // plan: an equi-join on the bucket, never a broadcast product
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)

    val b = blocked.select("cid", "n_eval_hits").as[(Long, Long)].collect().toMap
    val x = exact.select("cid", "n_eval_hits").as[(Long, Long)].collect().toMap
    // SRP blocking can only MISS pairs, never invent them
    assert(b.keySet.subsetOf(x.keySet))
    b.foreach { case (cid, hits) => assert(hits <= x(cid)) }
    // exact copies share every projection sign with their source eval
    // vector, so all 30 copied corpus ids must be flagged even blocked
    val copies = (100L until 160L by 2).toSet
    assert(copies.subsetOf(b.keySet))
  }

  test("multi-family SRP only ADDS recall, never pairs the exact path lacks") {
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(d => math.sin(seed * 17 + d * 13).toFloat)
    val evalSet = (0L until 8L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val corpus = (200L until 280L).map { i =>
      // perturbed eval copies: close in angle but sign flips possible
      val base = vec(((i - 200) % 8).toInt)
      val v = base.zipWithIndex.map { case (x, d) =>
        x + (if ((i + d) % 11 == 0) 0.4f else 0.02f) }
      (i, v)
    }.toDF("vec_id", "embedding")

    def flagged(families: Int): Set[Long] = Similarity.semanticContamination(
        evalSet, corpus, "vec_id", "embedding", threshold = 0.8,
        evalBroadcast = false, srpBits = 4, dims = dims, srpFamilies = families)
      .select("cid").as[Long].collect().toSet

    val one = flagged(1)
    val four = flagged(4)
    val exact = Similarity.semanticContamination(
        evalSet, corpus, "vec_id", "embedding", threshold = 0.8)
      .select("cid").as[Long].collect().toSet
    assert(one.subsetOf(four), "more families must never lose candidates")
    assert(four.subsetOf(exact), "blocking must never invent pairs")
    // per-cid hit counts agree with the exact path on flagged ids
    // (the cross-family distinct dedupes pairs surviving two families)
    val exactHits = Similarity.semanticContamination(
        evalSet, corpus, "vec_id", "embedding", threshold = 0.8)
      .select("cid", "n_eval_hits").as[(Long, Long)].collect().toMap
    Similarity.semanticContamination(
        evalSet, corpus, "vec_id", "embedding", threshold = 0.8,
        evalBroadcast = false, srpBits = 4, dims = dims, srpFamilies = 4)
      .select("cid", "n_eval_hits").as[(Long, Long)].collect()
      .foreach { case (cid, hits) => assert(hits <= exactHits(cid)) }
  }

  test("srpCandidatePairs families dial: monotone recall, exact-path subset, stable sims") {
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(d => math.cos(seed * 23 + d * 5).toFloat)
    val df = (0L until 60L).map { i =>
      // clustered pairs: i and i+30 are perturbed copies
      val base = vec((i % 30L).toInt)
      val v = if (i < 30) base
        else base.zipWithIndex.map { case (x, d) =>
          x + (if ((i + d) % 7 == 0) 0.3f else 0.01f) }
      (i, v)
    }.toDF("vec_id", "embedding")

    def pairs(families: Int): Map[(Long, Long), Double] =
      Similarity.srpCandidatePairs(df, "vec_id", "embedding",
          k = 4, threshold = 0.8, dims = dims, families = families)
        .as[(Long, Long, Double)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap

    val one = pairs(1)
    val three = pairs(3)
    // more families only ADD candidate pairs...
    assert(one.keySet.subsetOf(three.keySet))
    // ...and a pair surviving several families keeps ONE sim value
    // (the cross-family distinct is lossless)
    one.foreach { case (k_, v) => assert(three(k_) == v) }
    // every blocked pair is a true above-threshold pair: subset of the
    // brute-force all-pairs cosine at the same threshold
    val e = df.as[(Long, Array[Float])].collect()
    val brute = (for {
      (i, vi) <- e; (j, vj) <- e if i < j
      d = vi.zip(vj).map { case (a, b) => a.toDouble * b }.sum
      ni = math.sqrt(vi.map(x => x.toDouble * x).sum)
      nj = math.sqrt(vj.map(x => x.toDouble * x).sum)
      if d / (ni * nj) >= 0.8
    } yield (i, j)).toSet
    assert(three.keySet.subsetOf(brute))
    // the dial genuinely helps on this fixture (otherwise the test
    // proves nothing): family 1 alone misses some brute pair family 3 finds
    assert(three.keySet.size >= one.keySet.size)
  }
}
