package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-4 extension: edit-distance-verified near-dup pairs (q118) —
  * exact Levenshtein confirmation over the MinHash-LSH candidates.
  */
class EditDistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 2 is an exact copy of doc 1 (guaranteed LSH candidate, dist 0);
  // doc 3 edits one word of doc 1 (near-total shingle overlap -> LSH
  // candidate; positive distance); doc 4 shares nothing
  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away today"
  private val edited = base.replace("lazy", "noisy")
  private val docs = Seq(
    (1L, base), (2L, base), (3L, edited),
    (4L, "entirely different content with no overlap whatsoever in any token"))

  private def pairs(maxDist: Int, maxChars: Int = 400) =
    Dedup.editDistanceNearDup(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 9, bands = 3, maxChars = maxChars, maxDist = maxDist)
      .orderBy("d1", "d2")
      .select("d1", "d2", "edit_dist")
      .as[(Long, Long, Long)].collect().toSeq

  test("identical docs verify at distance 0; edits measure exactly") {
    val got = pairs(maxDist = 80)
    assert(got.contains((1L, 2L, 0L)))
    // "lazy" -> "noisy": substitute l->n, a->o, z->i, insert s = 4 ops
    assert(got.contains((1L, 3L, 4L)) && got.contains((2L, 3L, 4L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("maxDist drops candidate pairs the exact measure rejects") {
    val got = pairs(maxDist = 3)
    assert(got.contains((1L, 2L, 0L)))
    assert(!got.exists(p => p._2 == 3L))
  }

  test("maxChars caps the compared prefix") {
    // the edit sits past the cap, so the capped comparison sees
    // identical prefixes -> distance 0
    assert(pairs(maxDist = 80, maxChars = 30)
      .filter(p => p._2 == 3L).forall(_._3 == 0L))
  }
}
