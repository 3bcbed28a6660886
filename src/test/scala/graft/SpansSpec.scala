package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-4 extension: maximal cross-document repeated token spans
  * (q117) — the substring-level exact-dedup primitive.
  */
class SpansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")

  private def spans(rows: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] =
    Dedup.repeatedSpans(rows.toDF("doc_id", "text"), "doc_id", "text", window = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("overlapping duplicated windows merge into one maximal span") {
    // 12 shared tokens sit at offset 4 in doc 1 and offset 0 in doc 2:
    // five 8-token windows cover the run and merge into a single
    // 12-token span on each side
    val shared = toks("s", 12)
    val got = spans(Seq(
      (1L, s"${toks("a", 4)} $shared"),
      (2L, s"$shared ${toks("b", 4)}")))
    assert(got == Seq((1L, 4L, 12L, 5L), (2L, 0L, 12L, 5L)))
  }

  test("distant spans stay separate; within-doc repeats alone don't count") {
    // docs 1/2 share an 8-token head and an 8-token tail with nine
    // unshared tokens between -> two spans each; doc 3's self-repeat
    // appears in one document only -> no rows for it
    val head = toks("s", 8)
    val tail = toks("t", 8)
    val got = spans(Seq(
      (1L, s"$head ${toks("c", 9)} $tail"),
      (2L, s"$head ${toks("d", 9)} $tail"),
      (3L, s"${toks("x", 8)} ${toks("x", 8)}")))
    assert(got == Seq(
      (1L, 0L, 8L, 1L), (1L, 17L, 8L, 1L),
      (2L, 0L, 8L, 1L), (2L, 17L, 8L, 1L)))
  }

  test("abutting duplicated regions (hits exactly window apart) merge") {
    // doc 1's head matches doc 2, its tail matches doc 3; the two hit
    // offsets differ by exactly `window`, so the duplicated regions
    // abut and report as ONE contiguous 16-token span
    val got = spans(Seq(
      (1L, s"${toks("s", 8)} ${toks("t", 8)}"),
      (2L, s"${toks("s", 8)} ${toks("u", 8)}"),
      (3L, s"${toks("v", 8)} ${toks("t", 8)}")))
    assert(got == Seq((1L, 0L, 16L, 2L), (2L, 0L, 8L, 1L), (3L, 8L, 8L, 1L)))
  }

  test("documents shorter than the window contribute nothing") {
    val short = toks("s", 7)
    assert(spans(Seq((1L, short), (2L, short))).isEmpty)
  }
}
