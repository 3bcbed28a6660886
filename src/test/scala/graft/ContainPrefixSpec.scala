package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontaminate, Dedup}

/** Round-4 extensions: per-pair containment decontamination (q129) and
  * truncation-duplicate (prefix) pairs (q130).
  */
class ContainPrefixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("containmentPairs: fraction of eval shingles found per corpus doc") {
    // eval 1 = "a b c d" -> 2-shingles {a b, b c, c d}
    val evalDocs = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("id", "text")
    val corpus = Seq(
      (10L, "a b c q q q"),   // shares {a b, b c}: 2/3 of eval 1
      (11L, "x y z w tail"),  // shares all 3 of eval 2: containment 1.0
      (12L, "nothing shared here")).toDF("id", "text")

    val got = Decontaminate.containmentPairs(
        corpus, evalDocs, "id", "text", n = 2)
      .orderBy("cid", "eid")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

    assert(got == Seq(
      (10L, 1L, 2L, 3L, 0.666667),
      (11L, 2L, 3L, 3L, 1.0)))
  }

  test("containmentPairs honors minContainment") {
    val evalDocs = Seq((1L, "a b c d")).toDF("id", "text")
    val corpus = Seq((10L, "a b q"), (11L, "a b c d e")).toDF("id", "text")
    val got = Decontaminate.containmentPairs(
        corpus, evalDocs, "id", "text", n = 2, minContainment = 0.5)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((11L, 1L, 3L, 3L, 1.0)))
  }

  test("prefixDupPairs: strict char prefixes only, both block paths") {
    val docs = Seq(
      (1L, "abcdefghijklmnopQRST"), // 20 chars
      (2L, "abcdefghijklmnop"),     // 16 = blockChars: prefix of 1
      (3L, "abc"),                  // short path: prefix of 1 and 2
      (4L, "abx"),                  // short, not a prefix of anything
      (5L, "zzzzzzzzzzzzzzzzzz"),   // long, unrelated
      (6L, "abcdefghijklmnop")      // equal text to 2: NOT strict
    ).toDF("doc_id", "text")

    val got = Dedup.prefixDupPairs(docs, "doc_id", "text", blockChars = 16)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Long, Long)].collect().toSeq

    assert(got == Seq(
      (2L, 1L, 16L, 20L),
      (3L, 1L, 3L, 20L),
      (3L, 2L, 3L, 16L),
      (3L, 6L, 3L, 16L),
      (6L, 1L, 16L, 20L)))
  }
}
