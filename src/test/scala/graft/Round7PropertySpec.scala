package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityClassifier, Sharding, SparseSimilarity, TextAnalysis}

/** Boundary behavior of the round-7 operator family: df-cut edges,
  * degenerate window widths, shrink-rebalance, oversized codebooks,
  * empty documents.
  */
class Round7PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("allPairsCosine df-cut boundary: df == maxDf kept, df == maxDf + 1 cut") {
    // "x y z" in exactly 4 docs; each doc needs a df>=2 partner term to
    // matter, but the boundary is visible through pair existence
    def corpus(n: Int) =
      (1L to n.toLong).map(i => (i, s"x y z tail$i more$i words$i")).toDF("doc_id", "text")
    val at = SparseSimilarity.allPairsCosine(corpus(4), "doc_id", "text",
      n = 3, maxDf = 4, minCosine = 0.0).collect()
    assert(at.length == 6, "df == maxDf: all C(4,2) pairs witnessed")
    val over = SparseSimilarity.allPairsCosine(corpus(5), "doc_id", "text",
      n = 3, maxDf = 4, minCosine = 0.0).collect()
    assert(over.isEmpty, "df == maxDf + 1: the only shared term is cut")
  }

  test("weightedJaccard: empty docs never pair; identical docs score exactly 1.0") {
    val d = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),
      (3L, "")).toDF("doc_id", "text")
    val out = SparseSimilarity.weightedJaccardNearDup(d, "doc_id", "text",
      blockN = 3, maxDf = 5, threshold = 1.0).collect()
    assert(out.length == 1)
    assert((out.head.getLong(0), out.head.getLong(1)) == ((1L, 2L)))
    assert(out.head.getDouble(3) == 1.0,
      "identical docs survive the threshold-1.0 length prune and score 1.0")
  }

  test("winnowing w = 1 degenerates to every gram hash (positions 0..n-k)") {
    val text = (1 to 12).map(i => s"t$i").mkString(" ")
    val sel = TextAnalysis.winnowing(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", k = 3, w = 1)
      .orderBy("pos").collect().map(_.getLong(1))
    assert(sel.toSeq == (0L to 9L), "w=1: every window is one gram, all selected")
  }

  test("rendezvous shrink: moved docs are exactly those whose old winner was removed") {
    val d = (0L until 300L).map(i => (i, "")).toDF("doc_id", "text")
    val per = Sharding.rendezvousAssign(
        Sharding.rendezvousAssign(d, "doc_id", 6, outCol = "old_shard"),
        "doc_id", 4, outCol = "new_shard")
      .select("old_shard", "new_shard")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val moved = per.filter(p => p._1 != p._2)
    assert(moved.nonEmpty)
    assert(moved.forall(_._1 >= 4),
      "shrink 6 -> 4: only docs from the removed shards 4/5 move")
    assert(per.filter(p => p._1 < 4).forall(p => p._1 == p._2),
      "docs on surviving shards never move")
  }

  test("PQ books cap at the corpus when ks exceeds it; search still works") {
    val d = (0L until 6L).map(i =>
      (i, Seq.tabulate(4)(j => (i + j + 1).toFloat))).toDF("vec_id", "embedding")
    val books = graft.operators.Similarity.pqCodebooks(d, "vec_id", "embedding",
      dims = 4, m = 2, ks = 16, iters = 1)
    assert(books.forall(b => b.size <= 6))
    val out = graft.operators.Similarity.pqTopK(
      d.filter(col("vec_id") < 2), d, "vec_id", "embedding",
      dims = 4, m = 2, ks = 16, iters = 1, k = 2, refine = 2).collect()
    assert(out.groupBy(_.getLong(0)).values.forall(_.length == 2))
  }

  test("scoreExpr: heavy token repetition accumulates exactly (no overflow at fixture scale)") {
    val text = ("spam " * 5000).trim
    val model = QualityClassifier.LinearModel(Seq("spam" -> -1000L), 0L, 0.0)
    val score = Seq((1L, text)).toDF("doc_id", "text")
      .select(QualityClassifier.scoreExpr(col("text"), model))
      .collect().head.getDouble(0)
    assert(score == -1.0, "5000 * -1000 milli / (1000 * 5000) = -1 exactly")
  }
}
