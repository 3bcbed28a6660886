package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-4 extension: cluster-representative selection (q121). */
class ClusterKeepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("keeps the best-quality member per non-singleton cluster") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // cluster 1
      (4L, 4L), (5L, 4L),           // cluster 4
      (6L, 6L)                      // singleton: excluded
    ).toDF("doc_id", "cluster_id")
    val quality = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L),
      (4L, 7L), (5L, 7L), // tie -> lower id kept
      (6L, 99L)).toDF("doc_id", "n_tokens")

    val got = Dedup.clusterRepresentatives(clusters, quality, "doc_id", "n_tokens")
      .orderBy("cluster_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    assert(got == Seq(
      (1L, 3L, 2L, 30L, 2L),
      (4L, 2L, 4L, 7L, 1L)))
  }
}
