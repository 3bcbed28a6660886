package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling}

/** Round-4 extensions: segment-level boilerplate dedup (q114) and
  * domain-mix resampling (q115).
  */
class SegmentMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 8-token boilerplate header shared by docs 1 and 2; doc 3 is all
  // boilerplate (the same header twice); doc 4 shares nothing.
  private val header = (1 to 8).map(i => s"h$i").mkString(" ")
  private def body(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")

  test("segmentDedup drops cross-doc segments, keeps order, handles all-dropped") {
    val df = Seq(
      (1L, s"$header ${body("a")}"),
      (2L, s"$header ${body("b")}"),
      (3L, s"$header $header"),
      (4L, s"${body("c")} ${body("d")}")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(df, "doc_id", "text", segTokens = 8, maxDf = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_seg", "n_kept", "kept_fp")
      .as[(Long, Long, Long, String)].collect().toSeq

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    assert(got == Seq(
      (1L, 2L, 1L, md5hex(body("a"))),
      (2L, 2L, 1L, md5hex(body("b"))),
      (3L, 2L, 0L, md5hex("")),
      (4L, 2L, 2L, md5hex(s"${body("c")} ${body("d")}"))))
  }

  test("segmentDedup: within-doc repetition alone is not boilerplate") {
    // the repeated segment lives in ONE doc -> distinct-doc count is 1,
    // kept everywhere (self-repetition is q110's job, not dedup's)
    val df = Seq((1L, s"${body("x")} ${body("x")}")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(df, "doc_id", "text", segTokens = 8, maxDf = 1)
      .select("n_seg", "n_kept").as[(Long, Long)].head()
    assert(got == ((2L, 2L)))
  }

  test("domainMixSample: binding group keeps everything, mix follows targets") {
    // 3 groups x 40 rows; targets 1:2:5. C = min(n/t) = 40/(5/8) = 64,
    // so g5 binds (frac 1.0, keeps ALL 40), g2 frac = 64*(2/8)/40 = 0.4,
    // g1 frac = 0.2; absent group g0 is dropped entirely.
    val rows = for {
      g <- Seq("g1", "g2", "g5", "g0"); i <- 0 until 40
    } yield (s"$g-$i", g)
    val df = rows.toDF("id", "grp")
    val targets = Map("g1" -> 1.0, "g2" -> 2.0, "g5" -> 5.0)
    val kept = Sampling.domainMixSample(df, "id", "grp", targets)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap

    assert(!byGrp.contains("g0"), s"untargeted group survived: $byGrp")
    assert(byGrp("g5") == 40L, s"binding group must keep all rows: $byGrp")
    // hash-threshold counts are approximate; at n=40 a fair bound is
    // frac +- 0.25 absolute
    assert(math.abs(byGrp("g2") / 40.0 - 0.4) < 0.25, s"g2 off-target: $byGrp")
    assert(math.abs(byGrp("g1") / 40.0 - 0.2) < 0.25, s"g1 off-target: $byGrp")
    // schema passes through untouched (helper columns dropped)
    assert(kept.columns.toSeq == Seq("id", "grp"))
    // deterministic: a rerun keeps the identical id set
    val again = Sampling.domainMixSample(df, "id", "grp", targets)
      .select("id").as[String].collect().toSet
    assert(again == kept.select("id").as[String].collect().toSet)
  }

  test("temperatureMixture: sqrt flattening, exact integer allocation") {
    // domains with 10000 / 100 / 1 tokens: natural ratios 10000:100:1,
    // sqrt-temperature weights 100:10:1 — flattened but order-preserving
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      ("big", words(10000)), ("mid", words(100)), ("tiny", words(1)))
      .toDF("source", "text")
    val got = Sampling.temperatureMixture(docs, "source", "text", 111000L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got("big")._2 == 10000L && got("mid")._2 == 100L && got("tiny")._2 == 1L)
    // s = 100, 10, 1; st = 111
    assert(got("big")._3 == math.rint(100.0 / 111 * 1e6) / 1e6)
    assert(got("big")._4 == 111000L * 100 / 111)
    assert(got("mid")._4 == 111000L * 10 / 111)
    assert(got("tiny")._4 == 111000L * 1 / 111)
    // flattening: weight ratio (100x) far below the natural token
    // ratio (10000x), order preserved
    assert(got("big")._3 > got("mid")._3 && got("mid")._3 > got("tiny")._3)
    assert(got("big")._3 / got("tiny")._3 < 200)
    // allocations never exceed the budget
    assert(got.values.map(_._4).sum <= 111000L)
  }

  test("temperatureMixture: all-empty corpus yields weight 0 / alloc 0, not NaN/NULL") {
    val docs = Seq(("a", ""), ("b", ""), ("b", ""))
      .toDF("source", "text")
    val got = Sampling.temperatureMixture(docs, "source", "text", 1000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(got("a") == ((0.0, 0L)) && got("b") == ((0.0, 0L)))
  }

  test("temperatureMixture: near-Long.Max budget allocates exactly, no overflow") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(("big", words(10000)), ("tiny", words(1)))
      .toDF("source", "text")
    val budget = Long.MaxValue - 1 // product budget*s needs 126-bit decimal
    val got = Sampling.temperatureMixture(docs, "source", "text", budget)
      .collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    // s = 100, 1; st = 101 — exact BigInt reference
    def exact(s: Long) =
      (BigInt(budget) * s / 101).toLong
    assert(got("big") == exact(100L) && got("tiny") == exact(1L))
    assert(got.values.forall(_ >= 0L), "no wrapped negative allocation")
  }
}
