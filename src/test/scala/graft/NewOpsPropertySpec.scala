package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontaminate, Dedup, DocPipeline, Profiler}

/** Property-based checks of the q129-q132 operators against naive
  * in-memory reference computations on random inputs.
  */
class NewOpsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withWorkers(1)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def shingles(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("containmentPairs equals naive set intersection over fractions") {
    import spark.implicits._
    val vocab = Seq("aa", "bb", "cc", "dd", "ee")
    val genDoc = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    check("containment", Prop.forAll(
        Gen.listOfN(4, genDoc), Gen.listOfN(2, genDoc)) { (cs, es) =>
      val corpus = cs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val eval = es.zipWithIndex.map { case (ts, i) => (100L + i, ts.mkString(" ")) }
      val got = Decontaminate.containmentPairs(
          corpus.toDF("id", "text"), eval.toDF("id", "text"), "id", "text", n = 2)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val naive = (for {
        (cid, ct) <- corpus; (eid, et) <- eval
        cS = shingles(ct, 2); eS = shingles(et, 2)
        if eS.nonEmpty && (cS & eS).nonEmpty
      } yield {
        val shared = (cS & eS).size.toLong
        (cid, eid, shared, eS.size.toLong,
          BigDecimal(shared.toDouble / eS.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }).toSet
      got == naive
    })
  }

  test("prefixDupPairs equals the naive strict-prefix scan") {
    import spark.implicits._
    val genDoc = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b")))
      .map(_.mkString)
    check("prefix", Prop.forAll(Gen.listOfN(6, genDoc)) { ds =>
      val docs = ds.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // blockChars = 2 exercises BOTH the block-join and short-doc paths
      val got = Dedup.prefixDupPairs(docs.toDF("id", "text"), "id", "text",
          blockChars = 2)
        .as[(Long, Long, Long, Long)].collect().toSet
      val naive = (for {
        (ai, at) <- docs; (bi, bt) <- docs
        if at.length < bt.length && bt.startsWith(at)
      } yield (ai, bi, at.length.toLong, bt.length.toLong)).toSet
      got == naive
    })
  }

  test("joinSizeEstimate out_rows equals the materialized join count") {
    import spark.implicits._
    val genKeys = Gen.listOf(Gen.choose(0, 5))
    check("joinsize", Prop.forAll(genKeys, genKeys) { (lk, rk) =>
      val l = lk.toDF("k")
      val r = rk.toDF("r")
      val est = Profiler.joinSizeEstimate(l, r, "k", "r", topK = 3)
      val got = est.df
        .select("n_left_rows", "n_right_rows", "out_rows", "max_key_out")
        .as[(Long, Long, Long, Long)].head()
      est.unpersist()
      val joined = lk.flatMap(a => rk.filter(_ == a))
      val maxOut =
        if (joined.isEmpty) 0L
        else joined.groupBy(identity).map(_._2.size.toLong).max
      got == ((lk.size.toLong, rk.size.toLong, joined.size.toLong, maxOut))
    })
  }

  test("attritionReport conserves documents across every stage") {
    import spark.implicits._
    val genRow = Gen.zip(Gen.choose(0L, 30L), Gen.oneOf("en", "fr", "de"))
    check("funnel", Prop.forAll(Gen.listOf(genRow)) { rows0 =>
      val rows = rows0.zipWithIndex.map { case ((n, l), i) => (i.toLong, n, l) }
      val report = DocPipeline.attritionReport(
          rows.toDF("id", "len", "lang"),
          Seq("len" -> (col("len") >= 10L), "lang" -> (col("lang") === "en")))
        .orderBy("stage_idx")
        .as[(Long, String, Long, Long, Long, Option[Double], Option[Double])]
        .collect().toSeq
      val survivors = rows.count { case (_, n, l) => n >= 10L && l == "en" }
      val chained = report.sliding(2).forall {
        case Seq(a, b) => a._5 == b._3 // n_out chains into next n_in
        case _ => true
      }
      report.head._3 == rows.size.toLong &&
        report.last._5 == survivors.toLong &&
        chained &&
        report.map(_._4).sum == rows.size.toLong - survivors
    })
  }

  // ---- round-6 skew stress: the block/bucket dials under hot keys ----

  test("prefixDupPairs: hot boilerplate block stays correct; blockChars splits it") {
    import spark.implicits._
    // 400 docs sharing a 30-char boilerplate prefix then diverging,
    // plus 20 true truncation pairs (id >= 1000 is the truncation)
    val boiler = "x" * 30
    val longs = (0 until 400).map(i => (i.toLong, boiler + s" unique tail $i padpadpad"))
    val truncs = (0 until 20).map { i =>
      val full = longs(i)._2
      (1000L + i, full.substring(0, full.length - 5))
    }
    val docs = (longs ++ truncs).toDF("doc_id", "text")
    val expected = (0 until 20).map(i => (1000L + i, i.toLong)).toSet

    def run(blockChars: Int) = Dedup.prefixDupPairs(docs, "doc_id", "text", blockChars)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val hot = run(16)   // every doc in ONE 16-char block (all boilerplate)
    val split = run(48) // block key reaches the divergent region
    assert(hot == expected, s"hot-block output wrong: ${hot.take(5)}")
    // result is invariant under the dial — blockChars is plan shape only
    assert(split == hot)
    // and the dial genuinely splits the hot block: candidate meets per
    // block (the operator's internal join size) collapse from one
    // 420-doc block to per-pair blocks
    def meets(blockChars: Int): Long = docs
      .filter(length(col("text")) >= blockChars)
      .groupBy(substring(col("text"), 1, blockChars)).count()
      .agg(sum(col("count") * col("count"))).as[Long].head()
    assert(meets(16) >= 420L * 420L * 9 / 10)
    assert(meets(48) <= 4L * 420L)
  }

  test("intervalOverlapJoin: emit-once under a hot fully-overlapping key") {
    import spark.implicits._
    // 120 intervals on one key, all spanning [0, 100]: every pair
    // overlaps and shares all 11 buckets at width 10 — each pair must
    // still surface exactly once (first-overlap-bucket rule)
    val iv = (0L until 120L).map(i => (i, 1L, 0L, 100L))
      .toDF("id", "k", "s", "e")
    val got = operators.RangeJoin.intervalOverlapJoin(
        iv, iv, "id", "k", "s", "e", bucketWidth = 10L)
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(got.length == 120 * 119 / 2, s"expected C(120,2), got ${got.length}")
    assert(got.distinct.length == got.length)
  }

  test("intervalOverlapJoin: maxBucketsPerInterval fails loudly, not quadratically") {
    import spark.implicits._
    val iv = Seq((1L, 1L, 0L, 10_000_000L), (2L, 1L, 5L, 20L))
      .toDF("id", "k", "s", "e")
    val ex = intercept[Exception] {
      operators.RangeJoin.intervalOverlapJoin(
          iv, iv, "id", "k", "s", "e",
          bucketWidth = 10L, maxBucketsPerInterval = 64L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(e => Option(e.getMessage)).toSeq
    assert(messages(ex).exists(_.contains("spans more than 64 buckets")),
      messages(ex).mkString(" | "))
  }
}
