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
}
