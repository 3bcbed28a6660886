package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Hot-bucket guard in the batch LSH candidate-pair path: a bucket of
  * m > maxPerBucket members must emit m-1 star edges against the
  * bucket minimum instead of m(m-1)/2 all-vs-all pairs, with connected
  * components unchanged.
  */
class LshCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Signature frame where every doc with the same `v` lands in the
    * same bucket of every band (all 9 sigs = v).
    */
  private def sigsOf(rows: Seq[(Long, Long)]): DataFrame = {
    val base = rows.toDF("doc_id", "v")
    base.select(col("doc_id") +: (0 until 9).map(i => col("v").as(s"sig$i")): _*)
  }

  test("10k-member boilerplate bucket emits O(m) star edges, not m^2") {
    val hot = (0L until 10000L).map(i => (i, 777L)) // one degenerate bucket
    val smallB = Seq((20000L, 5L), (20001L, 5L), (20002L, 5L)) // under cap
    val singles = (30000L until 30010L).map(i => (i, 1000L + i))
    val cached = Dedup.lshCandidatePairsCached(
      sigsOf(hot ++ smallB ++ singles), "doc_id", k = 9, bands = 3)
    try {
      val pairs = cached.df.collect().map(r => (r.getLong(0), r.getLong(1)))
      // hot bucket: 9999 star edges all anchored at the bucket min (0)
      val hotPairs = pairs.filter(_._2 < 20000L)
      assert(hotPairs.length == 9999, s"expected m-1 star edges, got ${hotPairs.length}")
      assert(hotPairs.forall(_._1 == 0L), "star edges must anchor at the bucket min id")
      // small bucket below the cap keeps exhaustive pairs: C(3,2) = 3
      val smallPairs = pairs.filter(p => p._1 >= 20000L && p._1 < 30000L)
      assert(smallPairs.toSet == Set((20000L, 20001L), (20000L, 20002L), (20001L, 20002L)))
      // singletons pair with nobody
      assert(!pairs.exists(_._1 >= 30000L))
      assert(pairs.length == 9999 + 3)
    } finally cached.unpersist()
  }

  test("capped and uncapped pair sets yield identical connected components") {
    // three buckets straddling a cap of 8: sizes 20, 8, 2
    val rows = (0L until 20L).map(i => (i, 1L)) ++
      (100L until 108L).map(i => (i, 2L)) ++
      Seq((200L, 3L), (201L, 3L))
    val docs = rows.map(_._1).toDF("doc_id")
    def clusters(cap: Int): Map[Long, Long] = {
      val c = Dedup.lshCandidatePairsCached(sigsOf(rows), "doc_id", k = 9,
        bands = 3, maxPerBucket = cap)
      try Dedup.dupClusters(docs, c.df, "doc_id")
        .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
      finally c.unpersist()
    }
    val capped = clusters(8)
    val uncapped = clusters(1000)
    assert(capped == uncapped)
    assert((0L until 20L).forall(capped(_) == 0L))
    assert((100L until 108L).forall(capped(_) == 100L))
    assert(capped(201L) == 200L)
  }

  test("pairs stay d1 < d2 and distinct under the cap") {
    val rows = (0L until 50L).map(i => (i, 9L))
    val cached = Dedup.lshCandidatePairsCached(sigsOf(rows), "doc_id",
      k = 9, bands = 3, maxPerBucket = 10)
    try {
      val pairs = cached.df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.forall(p => p._1 < p._2))
      assert(pairs.distinct.length == pairs.length)
      assert(pairs.length == 49) // over-cap: star edges only
    } finally cached.unpersist()
  }
}
