package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextAnalysis}

/** Specs for the round-3 similarity/corpus extensions: SRP-LSH cosine
  * bucketing, int8 quantization error reporting, and KL mix drift.
  */
class SimilarityExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("srpSigns is deterministic and valued in {-1, +1}") {
    val a = Similarity.srpSigns(4, 16)
    val b = Similarity.srpSigns(4, 16)
    assert(a == b)
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
    // not degenerate: both signs occur
    assert(a.flatten.distinct.size == 2)
  }

  test("srpBuckets: identical vectors collide, negated vectors anti-collide") {
    import spark.implicits._
    val v = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val df = Seq(
      (1L, v), (2L, v), (3L, v.map(x => -x))
    ).toDF("vec_id", "embedding")
    val got = Similarity.srpBuckets(df, "vec_id", "embedding", k = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == got(2L))
    // every projection flips sign, so every bit flips
    assert(got(3L) == got(1L).map(c => if (c == '1') '0' else '1'))
  }

  test("srpCandidatePairs finds the near-identical pair only") {
    import spark.implicits._
    val v = Seq.tabulate(64)(i => math.cos(i * 0.3).toFloat)
    val near = v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val far = Seq.tabulate(64)(i => math.sin(i * 1.7 + 0.5).toFloat)
    val df = Seq((1L, v), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Similarity.srpCandidatePairs(df, "vec_id", "embedding", k = 6, threshold = 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ivf over k-means cells: recall >= lowest-id-cell baseline") {
    // the q113 claim: trained cells track the data distribution, so at
    // equal cell count and probe budget the k-means IVF cannot recall
    // worse than the arbitrary lowest-id-vector cells of plain ivfTopK
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, e, "vec_id", "embedding", k = 3)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx, "qid", "nbr", k = 3)
        .agg(org.apache.spark.sql.functions.avg("recall")).collect()(0).getDouble(0)
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 6)
    assert(cents.size == 8)
    val trained = meanRecall(Similarity.ivfTopK(
      queries, e, "vec_id", "embedding", k = 3, nProbe = 2, centroids = Some(cents)))
    val baseline = meanRecall(Similarity.ivfTopK(
      queries, e, "vec_id", "embedding", k = 3, nCells = 8, nProbe = 2))
    assert(trained >= baseline,
      s"k-means cells recall $trained < lowest-id baseline $baseline")
  }

  test("quantizationReport: constant dim has zero error, ranges surface") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 7.0f)),
      (2L, Seq(5.0f, 7.0f)),
      (3L, Seq(10.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.quantizationReport(df, "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val (n0, mn0, mx0, mse0, mae0) = rows(0L)
    assert(n0 == 3 && mn0 == 0.0 && mx0 == 10.0)
    // 256 levels over a span of 10: worst rounding error is half a
    // step (plus the report's own 6-decimal output rounding)
    assert(mae0 <= 10.0 / 255.0 / 2 + 1e-6)
    assert(mse0 >= 0.0 && mse0 <= mae0 * mae0 + 1e-12)
    val (_, mn1, mx1, mse1, mae1) = rows(1L)
    assert(mn1 == 7.0 && mx1 == 7.0 && mse1 == 0.0 && mae1 == 0.0)
  }

  test("tokenKlDrift: identical mixes score zero, skewed mixes positive") {
    import spark.implicits._
    val df = Seq(
      ("s0", "a b c d"), ("s0", "a b c d"),
      ("s1", "a b c d"),
      ("s2", "a a a a")
    ).toDF("source", "text")
    val got = TextAnalysis.tokenKlDrift(df, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // s0 and s1 match each other but not the corpus mix (which includes
    // s2's a-heavy skew), so they carry a small positive drift; s2 is
    // the outlier with the largest drift
    assert(got("s0") == got("s1"))
    assert(got("s2") > got("s0"))
    assert(got.values.forall(_ >= 0.0))
  }

  test("tokenKlDrift is zero when every source matches the corpus") {
    import spark.implicits._
    val df = Seq(("s0", "x y"), ("s1", "x y")).toDF("source", "text")
    val got = TextAnalysis.tokenKlDrift(df, "source", "text")
      .collect().map(r => r.getDouble(2))
    assert(got.forall(_ == 0.0))
  }

  test("semDeDup: keep-lowest-id within cells, hand-computed cosines, cells never mix") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two orthogonal cells; ids ordered so the keep rule is forced
    val cents = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val vecs = Seq(
      (10L, Seq(1.0, 0.0)),   // cell 0, smallest id -> keep, nn_sim NULL
      (11L, Seq(0.9, 0.1)),   // cell 0, cos to v10 = .993884 -> drop
      (12L, Seq(2.0, 0.0)),   // cell 0, cos to v10 = 1.0 -> drop
      (20L, Seq(0.0, 1.0)),   // cell 1, smallest id -> keep
      (21L, Seq(0.0, 5.0)),   // cell 1, cos to v20 = 1.0 -> drop
      (22L, Seq(-1.0, 1.0))   // cell 1, cos .707107 < tau -> keep
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(vecs, "vec_id", "embedding", cents, 0.95)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val c1011 = cos(Seq(1.0, 0.0), Seq(0.9, 0.1))
    val c2022 = cos(Seq(0.0, 1.0), Seq(-1.0, 1.0))
    assert(got == Seq(
      (10L, 0L, None, true),
      (11L, 0L, Some(c1011), false),
      (12L, 0L, Some(1.0), false),
      (20L, 1L, None, true),
      (21L, 1L, Some(1.0), false),
      // v22's only smaller-id cell mates are 20/21, both at .707107 --
      // cross-cell near-identity (v22 vs nothing in cell 0) never leaks
      (22L, 1L, Some(c2022), true)))
  }

  test("semDeDupIncrement: batch vs corpus only, union parity, empty cells stay NULL") {
    import spark.implicits._
    val cents = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val existing = Seq(
      (10L, Seq(1.0, 0.0)),   // cell 0
      (11L, Seq(0.9, 0.1))    // cell 0 — cell 1 has NO existing member
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (40L, Seq(2.0, 0.0)),   // cell 0: dup of existing v10 -> drop
      (41L, Seq(0.0, 1.0)),   // cell 1: no existing, smallest new -> NULL, keep
      (42L, Seq(0.0, 3.0)),   // cell 1: dup of NEW v41 -> drop
      (43L, Seq(-1.0, 1.0))   // cell 1: cos .707107 to 41/42 -> keep
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDeDupIncrement(
        existing, fresh, "vec_id", "embedding", cents, 0.95)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(got == Seq(
      (40L, 0L, Some(1.0), false),
      (41L, 1L, None, true),
      (42L, 1L, Some(1.0), false),
      (43L, 1L, Some(0.707107), true)))
    // union parity: with every existing id below every new id, the
    // increment's rows are exactly the from-scratch union dedup's rows
    // for the new ids — the q194 oracle property
    val union = Similarity.semDeDup(
        existing.unionByName(fresh), "vec_id", "embedding", cents, 0.95)
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 40L)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(got == union)
    // existing rows never appear in the output (no existing x existing
    // work is even representable)
    assert(got.map(_._1).forall(_ >= 40L))
  }

  test("semDeDupCellGuard: a planted hot cell fails fast with the named cap error") {
    import spark.implicits._
    val cents = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    // 6 vectors in cell 0 (15 pairs), 1 in cell 1 (0 pairs)
    val vecs = ((0L until 6L).map(i => (i, Seq(1.0, 0.01 * i))) :+
      (9L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    // cap below the hot cell's pair count -> named error citing the
    // cell, its occupancy, and the q173 remediation
    val e = intercept[IllegalStateException] {
      Similarity.semDeDupCellGuard(vecs, "vec_id", "embedding", cents,
        maxCellPairs = 10L)
    }
    assert(e.getMessage.contains("hot cell"), e.getMessage)
    assert(e.getMessage.contains("cluster 0"), e.getMessage)
    assert(e.getMessage.contains("15 within-cell pairs"), e.getMessage)
    assert(e.getMessage.contains("ivfSplitHotCells"), e.getMessage)
    // at or above the exact pair count the guard passes silently
    Similarity.semDeDupCellGuard(vecs, "vec_id", "embedding", cents,
      maxCellPairs = 15L)
  }
}
