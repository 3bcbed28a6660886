package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's failure taxonomy. r07 recorded a watchdog
  * cap-kill (q61, which passed standalone minutes later) as "failed" —
  * the list the next round triages for real breakage. The taxonomy is
  * a pure function so this can't silently regress again:
  * cancellation + wall budget exhausted = skipped, cancellation with
  * budget remaining = capped, anything else = failed.
  */
class BenchClassifySpec extends AnyFunSuite {

  private def cancelEx = new org.apache.spark.SparkException(
    "Job 42 cancelled part of cancelled job group q61_variant_get")

  test("watchdog cancel with wall budget remaining is capped, not failed") {
    assert(Bench.classifyFailure(cancelEx,
      budgetLimited = false, watchdogFired = true) === "capped")
  }

  test("watchdog cancel when the wall budget bound the cap is skipped") {
    assert(Bench.classifyFailure(cancelEx,
      budgetLimited = true, watchdogFired = true) === "skipped")
  }

  test("cancellation NOT caused by our watchdog stays failed") {
    // a SparkContext shutdown (executor OOM) also says "cancelled" —
    // genuine breakage must reach the failed triage list
    assert(Bench.classifyFailure(cancelEx,
      budgetLimited = false, watchdogFired = false) === "failed")
    assert(Bench.classifyFailure(cancelEx,
      budgetLimited = true, watchdogFired = false) === "failed")
  }

  test("cancellation buried in a cause chain is still recognized") {
    val wrapped = new RuntimeException("outer",
      new IllegalStateException("mid", cancelEx))
    assert(Bench.classifyFailure(wrapped,
      budgetLimited = false, watchdogFired = true) === "capped")
  }

  test("a genuine exception is failed regardless of budget state") {
    val boom = new RuntimeException("column not found: nope")
    assert(Bench.classifyFailure(boom,
      budgetLimited = false, watchdogFired = true) === "failed")
    assert(Bench.classifyFailure(boom,
      budgetLimited = true, watchdogFired = false) === "failed")
  }

  test("a cause chain longer than the probe depth does not loop") {
    val deep = (1 to 20).foldLeft(new RuntimeException("leaf"): Throwable) {
      (c, i) => new RuntimeException(s"wrap$i", c)
    }
    assert(Bench.classifyFailure(deep,
      budgetLimited = false, watchdogFired = true) === "failed")
  }

  test("orderQueries: priority block, then unknown, then heaviest-first tail") {
    val names = Seq("a", "b", "c", "d", "e", "f")
    val priority = Seq("c", "zz_renamed_away", "a")
    val prior = Map("b" -> 1.0, "d" -> 9.0, "e" -> 9.0, "a" -> 99.0)
    val out = Bench.orderQueries(names, priority, prior)
    // priority keeps its own order, dropping names not in this run;
    // f has no prior timing -> right after priority; d/e tie on time
    // -> name order; b is the cheap tail
    assert(out === Seq("c", "a", "f", "d", "e", "b"))
  }

  test("final stdout line fits the harness parse tail at the CURRENT query count") {
    // the harness parses the JSON metric line from the LAST ~2000
    // chars of stdout; sbt's trailing [success] line eats ~75. Build
    // the line exactly as Bench does — worst-case 4-char short names
    // and 3-digit-plus-decimal timings — at the real query count and
    // assert headroom under 1900 (r9 shipped parsed:null at 2063
    // chars; this pins the diet to the query count per round).
    val names = SparkEntry.queries.keySet.toSeq.sorted
    def shortName(n: String) = n.takeWhile(_ != '_').stripPrefix("q")
    assert(names.map(shortName).distinct.size == names.size,
      "short names must stay unique or the stdout map silently merges queries")
    // worst case per the format: every query lands in the widest
    // rendering (1-decimal just under the 10s integer cutoff)
    val qs = names.map(n => "\"" + shortName(n) + "\":9.9")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":9999.99,"unit":"sec","queries":$qs,"sf":0.1}"""
    assert(line.length < 1900,
      s"final line ${line.length} chars at ${names.size} queries — diet again " +
        "(next lever: drop the unit field or move the taxonomy lists to stderr)")
    // the 10s+ integer rendering is never wider
    val qsSlow = names.map(n => "\"" + shortName(n) + "\":60")
      .mkString("{", ",", "}")
    assert(qsSlow.length <= qs.length)
  }
}
