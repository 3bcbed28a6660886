package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiler

/** Round-4 extension: join-key skew diagnostics (q123). */
class SkewReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("reports cardinality, heavy key, percentiles and top-k mass") {
    // key "hot" has 8 rows; "a".."d" have 2 each -> 16 rows, 5 keys
    val rows = Seq.fill(8)("hot") ++ Seq("a", "a", "b", "b", "c", "c", "d", "d")
    val got = Profiler.skewReport(rows.toDF("k"), "k", topK = 2)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].head()

    val (nKeys, nRows, maxRows, p50, p99, topkRows, maxOverAvg, topkShare) = got
    assert(nKeys == 5L && nRows == 16L && maxRows == 8L)
    assert(p50 == 2L && p99 == 8L)
    assert(topkRows == 10L)            // hot(8) + a(2)
    assert(maxOverAvg == 2.5)          // 8 / (16/5)
    assert(topkShare == 0.625)         // 10/16
  }
}
