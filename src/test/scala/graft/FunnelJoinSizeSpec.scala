package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{DocPipeline, Profiler}

/** Round-4 extensions: join-size pre-flight (q131) and cleaning-funnel
  * attrition report (q132).
  */
class FunnelJoinSizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("joinSizeEstimate: exact output cardinality from count tables") {
    // left: key 1 x2, key 2 x1, key 3 x1; right: key 1 x3, key 2 x2, key 9 x1
    val left = Seq(1, 1, 2, 3).toDF("k")
    val right = Seq(1, 1, 1, 2, 2, 9).toDF("r")
    val est = Profiler.joinSizeEstimate(left, right, "k", "r", topK = 1)
    val got = est.df
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Double, Double)]
      .head()
    est.unpersist()
    // out = 2*3 + 1*2 = 8; max key contribution 6; top-1 share 6/8
    assert(got == ((4L, 6L, 3L, 3L, 2L, 8L, 6L, 6L, 0.75, 2.0)))
  }

  test("joinSizeEstimate: disjoint keys produce an all-zeros report") {
    val est = Profiler.joinSizeEstimate(
        Seq(1).toDF("k"), Seq(2).toDF("r"), "k", "r")
    val got = est.df
      .select("n_common_keys", "out_rows", "max_key_out", "topk_out_rows")
      .as[(Long, Long, Long, Long)].head()
    est.unpersist()
    assert(got == ((0L, 0L, 0L, 0L)))
  }

  test("attritionReport: first-failing stage charged, stages chain") {
    val docs = Seq(
      (1L, 10L, "en"), // fails min_len
      (2L, 20L, "fr"), // passes len, fails lang
      (3L, 30L, "en"), // survives
      (4L, 5L, "fr"),  // fails min_len (charged there, NOT to lang)
      (5L, 25L, "en")  // survives
    ).toDF("id", "len", "lang")

    val got = DocPipeline.attritionReport(docs, Seq(
        "min_len" -> (col("len") >= 15),
        "english" -> (col("lang") === "en")))
      .orderBy("stage_idx")
      .as[(Long, String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq

    assert(got == Seq(
      (0L, "min_len", 5L, 2L, 3L, Some(0.4), Some(0.6)),
      (1L, "english", 3L, 1L, 2L, Some(0.333333), Some(0.4))))
  }

  test("attritionReport: zero-drop stage still reported") {
    val docs = Seq((1L, 20L)).toDF("id", "len")
    val got = DocPipeline.attritionReport(docs, Seq(
        "keepall" -> (col("len") >= 0)))
      .as[(Long, String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq((0L, "keepall", 1L, 0L, 1L, Some(0.0), Some(1.0))))
  }
}
