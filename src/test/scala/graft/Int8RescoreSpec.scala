package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-4 extension: two-phase int8 retrieve-then-rescore ANN (q116). */
class Int8RescoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-vectors: dim d of id i = sin-free integer mix,
  // scaled into [-1, 1] — spread enough that min/max quantization is
  // non-degenerate
  private def vec(i: Int, dims: Int): Array[Float] =
    (0 until dims).map(d => (((i * 31 + d * 17 + 7) % 97) - 48) / 48.0f).toArray

  private lazy val corpus =
    (0 until 30).map(i => (i.toLong, vec(i, 16))).toDF("vec_id", "embedding")

  test("rescore with full-corpus shortlist equals exact brute force") {
    // k * refine = 30 > |corpus| - 1, so phase 1 keeps EVERYTHING and
    // the rescored top-k must match bruteForceTopK bit for bit
    val q = corpus.filter(col("vec_id") < 5)
    val got = Similarity.int8RescoreTopK(q, corpus, "vec_id", "embedding",
        k = 3, refine = 10)
      .select("qid", "rank", "nbr", "sim")
      .orderBy("qid", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3)
      .orderBy("qid", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("tight shortlist still returns k rows per query with valid coarse ranks") {
    val q = corpus.filter(col("vec_id") < 5)
    val got = Similarity.int8RescoreTopK(q, corpus, "vec_id", "embedding",
        k = 3, refine = 2)
      .select("qid", "rank", "nbr", "coarse_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1L, 2L, 3L)))
    // every survivor came from the phase-1 shortlist of size k*refine
    assert(got.forall { case (_, _, _, cr) => cr >= 1L && cr <= 6L })
  }
}
