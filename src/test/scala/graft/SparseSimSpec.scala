package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityClassifier, SparseSimilarity}

/** Sparse lexical similarity (df-cut all-pairs cosine, blocked
  * weighted Jaccard) and linear quality-classifier scoring.
  */
class SparseSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("allPairsCosine: identical docs hit cosine 1.0; df-cut drops ubiquitous terms") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),
      // doc4 shares "common one two" with doc5 and "one two three"
      // with doc6; every other 3-gram is a hapax and gets pruned, so
      // doc4's retained vector is {c:1, o:1} -> cos 1/sqrt(2)
      (4L, "common one two three unrelated tail"),
      (5L, "common one two something else entirely"),
      (6L, "one two three again and again once more"))
    val pairs = SparseSimilarity.allPairsCosine(d, "doc_id", "text",
      n = 3, maxDf = 4, minCosine = 0.0).collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(m((1L, 2L)) == 1.0, "identical pruned vectors must score exactly 1.0")
    assert(m((4L, 5L)) == 0.707107, "one of doc4's two retained terms shared")
    assert(m((4L, 6L)) == 0.707107)
    assert(!m.contains((5L, 6L)), "no shared retained term, no pair")
    assert(!m.contains((1L, 3L)), "no shared terms, no pair")
  }

  test("allPairsCosine: maxDf cut prunes a term shared by too many docs") {
    // "x y z" appears in 5 docs; with maxDf = 4 it cannot witness pairs
    val d = docs((1L to 5L).map(i => i -> s"x y z doc$i tail$i mark$i"): _*)
    val pairs = SparseSimilarity.allPairsCosine(d, "doc_id", "text",
      n = 3, maxDf = 4, minCosine = 0.0).collect()
    assert(pairs.isEmpty, "the only shared 3-gram is over the cut")
    val uncut = SparseSimilarity.allPairsCosine(d, "doc_id", "text",
      n = 3, maxDf = 5, minCosine = 0.0).collect()
    assert(uncut.length == 10, "raising the cut re-admits all C(5,2) pairs")
  }

  test("weightedJaccard sees repetition the set measure ignores") {
    val d = docs(
      (1L, "spam spam spam spam rare marker phrase"),
      (2L, "spam rare marker phrase"),
      (3L, "rare marker phrase wholly other content"))
    val out = SparseSimilarity.weightedJaccardNearDup(d, "doc_id", "text",
      blockN = 3, maxDf = 5, threshold = 0.0).collect()
    val m = out.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // doc1 vs doc2: min-overlap = 1(spam)+1+1+1 = 4; union = 7+4-4 = 7
    assert(m((1L, 2L)) == ((4L, math.rint(4.0 / 7.0 * 1e6) / 1e6)))
    // multiset identity: J_w(A,A) would be 1; near-identical asymmetric
    // repetition stays well under the set-Jaccard of the same pair
    assert(m((1L, 2L))._2 < 0.6)
  }

  test("scoreLinear: exact integer accumulation, OOV terms count toward dl only") {
    val d = docs(
      (1L, "good good bad"),   // 2*500 - 700 = 300 milli, dl 3
      (2L, "oov tokens only"), // raw 0, dl 3
      (3L, ""))                // zero tokens: dl 0, score = bias/1000
    val w = Seq("good" -> 500L, "bad" -> -700L)
    val out = QualityClassifier.scoreLinear(d, "doc_id", "text", w,
      biasMilli = 100L, threshold = 0.1).collect()
    val m = out.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(m(1L) == ((3L, math.rint((300 + 100) / 3000.0 * 1e6) / 1e6, true)))
    assert(m(2L) == ((3L, math.rint(100 / 3000.0 * 1e6) / 1e6, false)))
    assert(m(3L) == ((0L, 0.1, true)), "empty doc scores bias/1000 against dl=1")
  }

  test("scoreExpr matches scoreLinear cell-for-cell") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      (1L, "good good bad neutral words"),
      (2L, "entirely out of vocabulary text"),
      (3L, ""))
    val w = Seq("good" -> 500L, "bad" -> -700L)
    val model = QualityClassifier.LinearModel(w, biasMilli = 100L, threshold = 0.1)
    val viaAgg = QualityClassifier.scoreLinear(d, "doc_id", "text", w, 100L, 0.1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val viaExpr = d.select(col("doc_id"),
        QualityClassifier.scoreExpr(col("text"), model).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaExpr == viaAgg)
  }

  test("curateIncrement model gate: model_filtered label, failing docs shield nothing") {
    import graft.operators.DocPipeline
    val model = QualityClassifier.LinearModel(
      Seq("junk" -> -900L), biasMilli = 0L, threshold = -0.1)
    val cfg = DocPipeline.Config(minTokens = 2, model = Some(model))
    val base = docs((1L, "clean base document body here"))
    val batch = docs(
      (10L, "junk junk junk junk junk"),       // model_filtered
      (11L, "junk junk junk junk junk"),       // ALSO model_filtered: 10 shields nothing
      (12L, "clean novel content entirely new"),
      (13L, "x"))                              // quality fires before model
    val out = DocPipeline.curateIncrement(
      DocPipeline.curateState(base, "doc_id", "text"), batch,
      docs((90L, "held out eval sentence")), "doc_id", "text", cfg,
      maxHamming = 0)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(10L) == "model_filtered")
    assert(out(11L) == "model_filtered",
      "a model-failed doc must not become exact_dup_batch of another failed doc")
    assert(out(12L) == "kept")
    assert(out(13L) == "quality", "heuristic gate outranks the model gate")
  }

  test("scoreHashed is deterministic and length-normalized into [-1, 1]") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"))
    val out1 = QualityClassifier.scoreHashed(d, "doc_id", "text",
      buckets = 64, seed = "s:", biasMilli = 0L, threshold = 0.0).collect()
    val out2 = QualityClassifier.scoreHashed(d, "doc_id", "text",
      buckets = 64, seed = "s:", biasMilli = 0L, threshold = 0.0).collect()
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
    val m = out1.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(1L) == m(2L), "same text, same score")
    assert(out1.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }
}
