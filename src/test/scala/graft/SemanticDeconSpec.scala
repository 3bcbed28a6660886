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
}
