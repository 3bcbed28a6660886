package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Linkage, TimeSeries}

class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("blocked fuzzy pairs find typos inside a block, each pair once") {
    val df = Seq(
      (1L, "green widget"),
      (2L, "green widgat"),   // 1 edit from #1, same block
      (3L, "green gadget"),   // 2 edits from #1/#5, 3 from #2
      (4L, "blue widget"),    // different block (first token)
      (5L, "green widget"))   // exact dup of #1
      .toDF("id", "name")
    val pairs = Linkage.blockedFuzzyPairs(df, "id", "name", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set(
      (1L, 2L, 1), (1L, 5L, 0), (2L, 5L, 1), (1L, 3L, 2), (3L, 5L, 2)))
  }

  test("fuzzy pairs never compare across blocks (no cross product)") {
    // 100 names in distinct blocks -> zero candidate pairs at all
    val df = (1 to 100).map(i => (i.toLong, s"tok$i value")).toDF("id", "name")
    assert(Linkage.blockedFuzzyPairs(df, "id", "name", 2).count() == 0)
  }

  test("golden record: latest non-null wins per column, one row per cluster") {
    val df = Seq(
      // cluster 1: name only on the oldest row, bal only on the middle one
      (1L, 10L, Some("alice"), Some(5.0)),
      (1L, 20L, None, Some(7.0)),
      (1L, 30L, None, None),
      // cluster 2: fully populated latest row
      (2L, 11L, Some("bob"), Some(1.0)),
      (2L, 12L, Some("bobby"), Some(2.0)))
      .toDF("cl", "ts", "name", "bal")
    val got = Linkage.goldenRecord(df, "cl", "ts", "ts", Seq("name", "bal"))
      .as[(Long, Option[String], Option[Double])].collect()
      .map { case (k, n, b) => k -> ((n, b)) }.toMap
    assert(got(1L) == ((Some("alice"), Some(7.0))))
    assert(got(2L) == ((Some("bobby"), Some(2.0))))
  }

  test("resample fills gaps with zero over each key's own span") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:20:00")),
      (1L, Timestamp.valueOf("2024-01-01 03:05:00")),  // hours 1-2 missing
      (2L, Timestamp.valueOf("2024-01-01 05:00:00")))
      .toDF("k", "t")
    val got = TimeSeries.resampleCounts(df, "k", "t", 3600000000L)
      .as[(Long, Long, Long)].collect().toSet
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val hr = 3600000000L
    assert(got == Set(
      (1L, h0, 2L), (1L, h0 + hr, 0L), (1L, h0 + 2 * hr, 0L), (1L, h0 + 3 * hr, 1L),
      (2L, h0 + 5 * hr, 1L)))
  }

  test("resample rejects a pathological span instead of exploding") {
    val df = Seq(
      (1L, Timestamp.valueOf("1970-01-02 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")))  // ~473k hourly buckets
      .toDF("k", "t")
    val ex = intercept[Exception] {
      TimeSeries.resampleCounts(df, "k", "t", 3600000000L,
        maxBucketsPerKey = 1000L).collect()
    }
    assert(ex.getMessage.contains("spans more than"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("rolling z-score: excluded current row, full-window gating, spike flagged") {
    val vals = Seq(10.0, 10.0, 10.0, 12.0, 8.0, 10.0, 100.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "seq", "v")
    val got = TimeSeries.rollingZscore(df, "k", Seq("seq"), "v", nPrev = 5)
      .select("seq", "z").as[(Long, Option[Double])].collect().toMap
    // rows 0-4 lack a full trailing window
    assert((0L to 4L).forall(got(_).isEmpty))
    // row 6 is the spike: far above the trailing [10,10,12,8,10]
    assert(got(6L).exists(_ > 10))
    // row 7 is normal but its window contains the spike -> small |z|
    assert(got(7L).exists(z => math.abs(z) < 2))
  }

  test("sortedNeighborhood: adjacent-in-order near-dups found, window bound respected") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zets"),   // 1 edit from doc 1
      (3L, "alpha beta gamma wholly different tail content here"),
      (4L, "omega psi chi phi upsilon tau"),
      (5L, "zzzz unrelated bucket entirely")).toDF("doc_id", "text")
    val out = graft.operators.Linkage.sortedNeighborhoodNearDup(
        d, "doc_id", "text", bucketLen = 4, sortLen = 40, window = 2,
        maxChars = 200, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L)),
      "only the 1-edit neighbors survive maxDist; cross-bucket docs never pair")
    // window bound: with maxDist huge, candidates per doc <= window
    val all = graft.operators.Linkage.sortedNeighborhoodNearDup(
        d, "doc_id", "text", bucketLen = 1, sortLen = 40, window = 1,
        maxChars = 200, maxDist = 1000).collect()
    assert(all.length <= 4, "window=1 in one bucket: at most n-1 adjacent pairs")
  }

  test("sortedNeighborhood: banded equi-join equals the naive reference on a random corpus") {
    // deterministic pseudo-random corpus with skewed prefixes (many
    // docs share a bucket) — the exact shape the (bucket, rank)
    // equi-key rework must not change results on
    val rnd = new scala.util.Random(42)
    val prefixes = Seq("the quick", "the quick", "the slow", "data")
    val docs = (1L to 120L).map { i =>
      val p = prefixes(rnd.nextInt(prefixes.size))
      val tail = (1 to 3 + rnd.nextInt(4)).map(_ => s"w${rnd.nextInt(9)}").mkString(" ")
      (i, s"$p $tail")
    }
    val (bucketLen, sortLen, window, maxChars, maxDist) = (4, 40, 3, 60, 25)
    // naive reference: per-bucket sort, compare each doc against the
    // next `window` docs in order, plain edit distance
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = docs
      .map { case (id, t) =>
        (t.toLowerCase.take(bucketLen), t.toLowerCase.take(sortLen), id, t.take(maxChars))
      }
      .groupBy(_._1).values.flatMap { bucket =>
        val ranked = bucket.sortBy(r => (r._2, r._3))
        for {
          a <- ranked.indices
          b <- (a + 1) until math.min(a + 1 + window, ranked.size)
          dist = lev(ranked(a)._4, ranked(b)._4) if dist <= maxDist
        } yield (math.min(ranked(a)._3, ranked(b)._3),
          math.max(ranked(a)._3, ranked(b)._3), dist.toLong)
      }.toSet
    val got = graft.operators.Linkage.sortedNeighborhoodNearDup(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        bucketLen, sortLen, window, maxChars, maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"banded join diverged: extra=${got -- expected}, missing=${expected -- got}")
    assert(expected.nonEmpty, "fixture must actually produce pairs")
  }
}
