package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Winnowing fingerprint selection: the two paper guarantees (bounded
  * gap, shared-run detection) plus the short-document fallbacks.
  */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val k = 3
  private val w = 4

  test("bounded gap: consecutive selected positions differ by at most w") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val sel = TextAnalysis.winnowing(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", k, w)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(sel.nonEmpty)
    assert(sel.head <= (w - 1).toLong, "a selection must appear in the first window")
    sel.sliding(2).foreach {
      case Array(a, b) => assert(b - a <= w, s"gap $a -> $b exceeds w")
      case _ =>
    }
    assert(sel.last >= (60 - k + 1 - w).toLong, "a selection must appear in the last window")
  }

  test("shared token run of w + k - 1 yields a shared fingerprint hash") {
    val shared = (1 to (w + k - 1)).map(i => s"common$i").mkString(" ")
    val d = Seq(
      (1L, s"aaa bbb ccc ddd eee $shared fff ggg hhh"),
      (2L, s"zzz yyy xxx $shared www vvv uuu ttt sss")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowing(d, "doc_id", "text", k, w)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty,
      "documents sharing a w+k-1 token run must share a fingerprint")
  }

  test("short documents: under w grams selects from the one short window; under k tokens selects nothing") {
    val d = Seq(
      (1L, "a b c d"),   // 2 grams < w: global rightmost-min only
      (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.winnowing(d, "doc_id", "text", k, w).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1, "one window -> one selection")
    assert(!byDoc.contains(2L), "sub-k docs contribute nothing (strict grams)")
  }
}
