package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke checks of the driver contract; the real correctness gate is
  * the DuckDB oracle (tools/check.py) over every query.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and runs non-empty at sf0.001") {
    val qs = SparkEntry.queries
    val missing = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("localFrame memo guard: an over-cap artifact fails fast instead of OOMing the driver") {
    val big = spark.range(11).toDF("id")
    val e = intercept[IllegalStateException] {
      SparkEntry.localFrame(big, maxRows = 10)
    }
    assert(e.getMessage.contains("driver memo cap"))
    // at or under the cap the probe IS the full artifact
    val ok = SparkEntry.localFrame(spark.range(10).toDF("id"), maxRows = 10)
    assert(ok.rows.size == 10)
  }
}
