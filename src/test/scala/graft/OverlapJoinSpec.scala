package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Round-4 extension: interval x interval overlap join (q122). */
class OverlapJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def join(
      a: Seq[(Long, String, Long, Long)],
      b: Seq[(Long, String, Long, Long)],
      width: Long) =
    RangeJoin.intervalOverlapJoin(
        a.toDF("id", "k", "s", "e"), b.toDF("id", "k", "s", "e"),
        "id", "k", "s", "e", bucketWidth = width)
      .orderBy("a_id", "b_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("overlapping intervals pair exactly once, with the overlap bounds") {
    val a = Seq((1L, "k", 0L, 100L), (2L, "k", 500L, 600L))
    val b = Seq(
      (10L, "k", 50L, 150L),   // overlaps 1 across many buckets
      (11L, "k", 100L, 100L),  // touches 1 at a single point
      (12L, "k", 101L, 400L),  // adjacent to 1, no overlap
      (13L, "x", 0L, 100L))    // different key
    assert(join(a, b, width = 10L) == Seq(
      ("k", 1L, 10L, 50L, 100L),
      ("k", 1L, 11L, 100L, 100L)))
  }

  test("bucket width does not change the result, only the plan") {
    val a = Seq((1L, "k", 0L, 1000L))
    val b = Seq((2L, "k", 999L, 2000L), (3L, "k", 1001L, 2000L))
    val expected = Seq(("k", 1L, 2L, 999L, 1000L))
    assert(join(a, b, 7L) == expected)
    assert(join(a, b, 1000L) == expected)
  }

  test("inverted intervals match nothing") {
    val a = Seq((1L, "k", 10L, 5L))
    val b = Seq((2L, "k", 0L, 100L))
    assert(join(a, b, 10L).isEmpty)
  }
}
