package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

/** BPE merge training: frequency-weighted pair argmax, lexicographic
  * tie-break, and the documented one-pass-per-round semantics on
  * alternating runs.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def merges(text: String, n: Int) =
    BpeTrainer.trainMerges(Seq(Tuple1(text)).toDF("text"), "text", n)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("frequency-weighted argmax across words; merged symbol feeds later rounds") {
    // wf: aab x2, ab x1 -> round 1: (a,b) cnt 3 beats (a,a) cnt 2
    // (tie with (b,_) cnt 3 breaks lexicographically to "a b");
    // round 2: the NEW symbol "ab" pairs with _ in all 3 words
    val out = merges("aab aab ab", 2)
    assert(out.toSeq == Seq((1L, "a", "b", 3L), (2L, "ab", "_", 3L)))
  }

  test("alternating run: one replace pass merges one occurrence, the next round catches the rest") {
    val out = merges("abab", 2)
    assert(out(0) == ((1L, "a", "b", 2L)), "both (a,b) occurrences counted")
    assert(out(1) == ((2L, "a", "b", 1L)),
      "the boundary-consumed occurrence survives to round 2 (documented replace semantics)")
  }

  test("merging exhausts: single-char words stop the loop early") {
    val out = merges("a a b", 2)
    // " a _ " x2 and " b _ ": round 1 merges (a,_) cnt 2; round 2 merges (b,_) cnt 1
    assert(out.length == 2)
    assert(out(0) == ((1L, "a", "_", 2L)))
    assert(out(1) == ((2L, "b", "_", 1L)))
    // all words now single symbols: a third round returns only 2 rows
    assert(merges("a a b", 5).length == 2, "loop stops when no pairs remain")
  }
}
