package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics

/** Round-4 extension: classifier threshold sweep (q120). */
class SweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cumulative tp/fp, precision and recall per threshold bucket") {
    // scores 0..9 in 5 buckets of width 2; positives at scores >= 6
    val df = (0 until 10).map(i => (i.toDouble, i >= 6)).toDF("score", "lab")
    val got = Metrics.thresholdSweep(df, "score", "lab", buckets = 5)
      .select("bucket", "threshold", "tp", "fp", "fn", "precision", "recall")
      .as[(Long, Double, Long, Long, Long, Double, Double)].collect().toSeq

    // bucket k covers scores [2k - epsilon-free equi-width bounds);
    // selecting at bucket b keeps all buckets >= b (score >= 2b)
    assert(got == Seq(
      (0L, 0.0, 4L, 6L, 0L, 0.4, 1.0),       // keep all
      (1L, 1.8, 4L, 4L, 0L, 0.5, 1.0),       // score >= 1.8 -> 2..9
      (2L, 3.6, 4L, 2L, 0L, 0.666667, 1.0),  // 4..9
      (3L, 5.4, 4L, 0L, 0L, 1.0, 1.0),       // 6..9 all positive
      (4L, 7.2, 2L, 0L, 2L, 1.0, 0.5)))      // 8..9
  }

  test("constant scores collapse to one bucket") {
    val df = Seq((5.0, true), (5.0, false), (5.0, true)).toDF("score", "lab")
    val got = Metrics.thresholdSweep(df, "score", "lab", buckets = 4)
      .select("bucket", "tp", "fp", "fn").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1L, 0L)))
  }

  test("probe selection: smallest meeting the target, widest-measured fallback") {
    import graft.operators.Similarity
    val sweep = Seq(1L -> 500000L, 2L -> 880000L, 4L -> 930000L, 8L -> 990000L)
    assert(Similarity.pickProbe(sweep, 900000L) == 4)
    assert(Similarity.pickProbe(sweep, 100000L) == 1)
    // nothing meets the bar: deploy the widest MEASURED setting, not
    // an unmeasured wider one
    assert(Similarity.pickProbe(sweep, 999999L) == 8)
    intercept[IllegalArgumentException](Similarity.pickProbe(Nil, 1L))
  }

  test("stored probe sweep: write, re-derived read, and re-measure swap") {
    import org.apache.spark.sql.functions.{col, lit, when}
    import graft.operators.Similarity
    val sweep = Seq(
      (1L, 20L, 10L, 60L, 500000L),
      (2L, 20L, 53L, 60L, 880000L),
      (4L, 20L, 56L, 60L, 930000L),
      (8L, 20L, 59L, 60L, 990000L))
      .toDF("n_probe", "n_queries", "hits", "possible", "recall_ppm")
    val path = java.nio.file.Files
      .createTempDirectory("spec-probe-sweep").resolve("sweep").toString
    Similarity.writeProbeSweep(sweep, path)
    assert(Similarity.readSelectedNProbe(spark, path, 900000L) == 4)
    assert(Similarity.readSelectedNProbe(spark, path, 999999L) == 8,
      "widest-measured fallback must hold through the stored path")
    // a re-measured sweep (probe 2 now meets the bar) changes the
    // deployed width through the SAME read — the selection rule is
    // re-derived from the stored rows, never frozen into the artifact
    Similarity.writeProbeSweep(sweep.withColumn("recall_ppm",
      when(col("n_probe") === 2L, lit(950000L))
        .otherwise(col("recall_ppm"))), path)
    assert(Similarity.readSelectedNProbe(spark, path, 900000L) == 2,
      "overwriting the stored sweep must re-tune the deployed probe width")
  }
}
