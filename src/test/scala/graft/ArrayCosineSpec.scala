package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayCosine, ArrayDotProduct}
import graft.operators.Similarity

/** Round-4 extension: the fused codegen'd cosine expression and the
  * ad-hoc probe top-k built on it (q127).
  */
class ArrayCosineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ArrayDotProduct(a, b) /
      (sqrt(ArrayDotProduct(a, a)) * sqrt(ArrayDotProduct(b, b)))

  test("bit-identical to the composed dot/norm form") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),      // orthogonal -> 0.0
      (Array(0.1, 0.2, 0.3), Array(0.1, 0.2, 0.3)),
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0))  // length mismatch: min-prefix dot
    ).toDF("a", "b")
    val rows = df.select(
        ArrayCosine(col("a"), col("b")).as("fused"),
        composed(col("a"), col("b")).as("ref"))
      .as[(Double, Double)].collect()
    rows.foreach { case (f, r) =>
      assert(java.lang.Double.doubleToLongBits(f) ==
        java.lang.Double.doubleToLongBits(r))
    }
  }

  test("zero norm yields NaN where ANSI division would kill the job") {
    // the composed form throws DIVIDE_BY_ZERO under Spark 4 ANSI mode;
    // the fused expression returns IEEE NaN so one degenerate vector
    // can't fail a full-corpus scoring pass
    val df = Seq((Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val got = df.select(ArrayCosine(col("a"), col("b"))).as[Double].head()
    assert(got.isNaN)
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(ArrayCosine(col("a"), col("b"))).head().isNullAt(0))
  }

  test("probeTopK ranks by fused cosine against the inlined probe") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f)),   // parallel: sim 1.0
      (2L, Array(1.0f, 1.0f)),   // sim ~0.70711
      (3L, Array(0.0f, 1.0f)),   // orthogonal: 0
      (4L, Array(-1.0f, 0.0f))). // anti-parallel: -1
      toDF("vec_id", "embedding")
    val got = Similarity.probeTopK(corpus, "vec_id", "embedding", probeId = 0L, k = 3)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 0.70711), (3L, 0.0)))
  }
}
