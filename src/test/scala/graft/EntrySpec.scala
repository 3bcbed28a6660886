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
}
