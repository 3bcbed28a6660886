package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Product quantization + ADC search: codebook shape, code range,
  * exact-rescore agreement with brute force, and recall on a
  * cluster-structured corpus.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** 40 vectors in 8 dims: four tight clusters of 10 around distinct
    * axis-aligned anchors (id div 10 picks the cluster, id%10 a tiny
    * deterministic jitter on one coordinate).
    */
  private def corpus = {
    import spark.implicits._
    (0L until 40L).map { i =>
      val c = (i / 10).toInt
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.5f
      base(7 - c) = base(7 - c) + (i % 10) * 0.01f
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codebooks: m books of <= ks centroids over the right slice width") {
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    assert(books.length == 2)
    books.foreach { b =>
      assert(b.nonEmpty && b.size <= 4)
      assert(b.forall(_._2.length == 4), "centroids live in the 4-dim subspace")
      assert(b.map(_._1) == b.map(_._1).sorted, "books are cid-sorted")
    }
  }

  test("IVF-PQ: cell probe + ADC returns same-cluster neighbors with exact rescored sims") {
    val q = corpus.filter(col("vec_id") < 4)
    val out = Similarity.ivfPqTopK(q, corpus, "vec_id", "embedding",
        dims = 8, m = 2, ks = 4, pqIters = 2,
        nCells = 4, ivfIters = 2, nProbe = 2, k = 3, refine = 3)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L)))
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-12)
      assert(r.getLong(2) / 10 == r.getLong(0) / 10,
        s"query ${r.getLong(0)} pulled cross-cluster neighbor ${r.getLong(2)}")
    }
  }

  test("ADC top-k: exact sims match brute force; high recall on clustered data") {
    val q = corpus.filter(col("vec_id") < 4)
    val pq = Similarity.pqTopK(q, corpus, "vec_id", "embedding",
        dims = 8, m = 2, ks = 4, iters = 2, k = 3, refine = 3)
      .collect()
    assert(pq.map(r => (r.getLong(0), r.getLong(1))).toSet.size == pq.length)
    // every query gets exactly k=3 ranked rows
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L)))
    // the rescored sim IS the exact cosine: cross-check against brute force
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(brute(key) - r.getDouble(3)) < 1e-12,
        s"rescored sim must equal exact cosine for $key")
    }
    // recall@3: with 10 same-cluster neighbors per query and 4 clean
    // clusters, ADC must surface same-cluster vectors
    pq.foreach { r =>
      assert(r.getLong(2) / 10 == r.getLong(0) / 10,
        s"query ${r.getLong(0)} pulled cross-cluster neighbor ${r.getLong(2)}")
    }
  }
}
