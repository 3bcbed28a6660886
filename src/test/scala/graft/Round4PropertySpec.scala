package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Metrics, RangeJoin}

/** Property-based checks of the round-4 operators against naive
  * in-memory reference computations on random inputs — duplicates,
  * touching bounds, empty docs, and skewed labels that hand-written
  * examples miss.
  */
class Round4PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withWorkers(1)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("intervalOverlapJoin equals the naive theta join, any bucket width") {
    import spark.implicits._
    val genSide = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("k0", "k1"), Gen.choose(0L, 40L), Gen.choose(-3L, 15L)))
    val genWidth = Gen.choose(1L, 25L)
    check("overlap", Prop.forAll(genSide, genSide, genWidth) { (l0, r0, w) =>
      // unique ids per side; len < 0 makes some intervals inverted
      val l = l0.zipWithIndex.map { case ((k, s, len), i) => (i.toLong, k, s, s + len) }
      val r = r0.zipWithIndex.map { case ((k, s, len), i) => (1000L + i, k, s, s + len) }
      val got = RangeJoin.intervalOverlapJoin(
          l.toDF("id", "k", "s", "e"), r.toDF("id", "k", "s", "e"),
          "id", "k", "s", "e", bucketWidth = w)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val naive = (for {
        a <- l; b <- r
        if a._2 == b._2 && a._3 <= a._4 && b._3 <= b._4 &&
          a._3 <= b._4 && b._3 <= a._4
      } yield (a._2, a._1, b._1,
        math.max(a._3, b._3), math.min(a._4, b._4))).toSet
      got == naive
    })
  }

  test("repeatedSpans equals the naive window-merge on random tiny docs") {
    import spark.implicits._
    val W = 3
    val vocab = Seq("aa", "bb", "cc", "dd")
    val genDoc = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val genDocs = Gen.listOfN(4, genDoc)
    check("spans", Prop.forAll(genDocs) { ds =>
      val docs = ds.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val got = Dedup.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", W)
        .as[(Long, Long, Long, Long)].collect().toSet

      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq }
      val wins = toks.flatMap { case (id, ts) =>
        if (ts.size >= W)
          (0 to ts.size - W).map(p => (id, p.toLong, ts.slice(p, p + W).mkString(" ")))
        else Nil
      }
      val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val naive = wins.filter(x => dup(x._3)).map(x => (x._1, x._2))
        .groupBy(_._1).flatMap { case (id, hs) =>
          val islands = hs.map(_._2).sorted.foldLeft(List.empty[List[Long]]) {
            case (Nil, p) => List(List(p))
            case (cur :: rest, p) =>
              if (p - cur.head <= W) (p :: cur) :: rest else List(p) :: cur :: rest
          }
          islands.map(isl =>
            (id, isl.min, isl.max - isl.min + W, isl.size.toLong))
        }.toSet
      got == naive
    })
  }

  test("thresholdSweep invariants: monotone cumulative counts, conserved totals") {
    import spark.implicits._
    val genRows = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0.0, 100.0), Gen.oneOf(true, false)))
    check("sweep", Prop.forAll(genRows) { rows =>
      val out = Metrics.thresholdSweep(
          rows.toDF("score", "lab"), "score", "lab", buckets = 6)
        .orderBy("bucket")
        .select("tp", "fp", "fn").as[(Long, Long, Long)].collect().toSeq
      val pos = rows.count(_._2).toLong
      val neg = rows.size - pos
      out.nonEmpty &&
        out.head._1 == pos &&                          // keep-all row sees every positive
        out.head._2 == neg &&
        out.forall { case (tp, fp, fn) => tp + fn == pos && fp <= neg } &&
        out.sliding(2).forall {
          case Seq((tp1, fp1, _), (tp2, fp2, _)) => tp2 <= tp1 && fp2 <= fp1
          case _ => true
        }
    })
  }
}
