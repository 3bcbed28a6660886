package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Affinity, Cdc, Ranking, RobustStats, ZOrderLayout}

class RankingStatsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bm25 ranks the doc saturated in a rare term first") {
    val docs = Seq(
      (1L, "rare rare rare word word"),
      (2L, "word word word word word"),
      (3L, "rare word other other other"),
      (4L, "other other other other other")
    ).toDF("doc_id", "text")
    val top = Ranking.bm25(docs, "doc_id", "text", Seq("rare", "word"), topK = 4)
      .collect()
    assert(top.head.getLong(0) == 1L)
    // doc 4 matches nothing -> it must not appear at all
    assert(!top.map(_.getLong(0)).contains(4L))
    // scores strictly ordered desc (ties broken by id upstream)
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("inverted index: full df, capped + sorted postings") {
    val docs = (1 to 30).map(i =>
      (i.toLong, if (i % 3 == 0) "common triple" else "common solo")).toDF("doc_id", "text")
    val idx = Ranking.invertedIndex(docs, "doc_id", "text", maxPostings = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // df counts every doc containing the term, not just the capped list
    assert(idx("common")._1 == 30L)
    assert(idx("triple")._1 == 10L)
    // postings are the smallest ids, ascending, capped at 5
    assert(idx("common")._2 == "1,2,3,4,5")
    assert(idx("triple")._2 == "3,6,9,12,15")
  }

  test("unigram logprob: the all-rare-token doc scores lowest") {
    val docs = (1 to 20).map(i => (i.toLong, "the the the common"))
      .toDF("doc_id", "text")
      .union(Seq((99L, "zebra qux vex")).toDF("doc_id", "text"))
    val out = Ranking.unigramLogProb(docs, "doc_id", "text", k = 3).collect()
    assert(out.head.getLong(0) == 99L)
    assert(out.head.getDouble(2) < out.last.getDouble(2) + 1e-9)
  }

  test("MAD outliers: resistant to the outliers it reports") {
    val rows = (1 to 100).map(i => ("a", 10.0 + (i % 5))) ++
      Seq(("a", 5000.0), ("a", -4000.0)) ++
      (1 to 50).map(i => ("b", 100.0))
    val out = RobustStats.madOutliers(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // the two wild points must not drag the median/MAD
    assert(out("a").getDouble(2) >= 10.0 && out("a").getDouble(2) <= 14.0)
    assert(out("a").getLong(4) == 2L)
    // a constant group has mad 0 and no outliers
    assert(out("b").getDouble(3) == 0.0)
    assert(out("b").getLong(4) == 0L)
  }

  test("z-order interleave is a bijection on the grid and buckets bound both dims") {
    val df = spark.range(0, 1024).select(
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
    val withZ = df.select(col("x"), col("y"),
      ZOrderLayout.interleave(col("x"), col("y"), 5).as("z"))
    val zs = withZ.select("z").as[Long].collect()
    assert(zs.distinct.length == 1024 && zs.min == 0L && zs.max == 1023L)
    // every 64-wide z-range covers at most an 8x8 tile in (x, y)
    val spans = withZ.groupBy(expr("z div 64").as("b"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(spans.forall(r => r.getLong(1) <= 7 && r.getLong(2) <= 7))
  }

  test("clusterByZ keeps z-ranges disjoint across partitions") {
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val parts = ZOrderLayout.clusterByZ(df, "x", "y", bits = 6, numPartitions = 8)
      .select(spark_partition_id().as("p"),
        ZOrderLayout.interleave(col("x"), col("y"), 6).as("z"))
      .groupBy("p").agg(min("z").as("zlo"), max("z").as("zhi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("equi-width histogram partitions the row count and clamps edges") {
    val vals = Seq(-50.0, 0.0, 10.0, 25.0, 99.0, 150.0, 260.0).toDF("v")
    val h = RobustStats.equiWidthHistogram(vals, "v", lo = 0.0, width = 50.0, nBuckets = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.values.sum == 7L)
    assert(h(0L) == 4L) // -50 clamps up into bucket 0
    assert(h(4L) == 1L) // 260 clamps down into the last bucket
  }

  test("winsorized mean clips tails but leaves the bulk untouched") {
    val rows = (1 to 98).map(i => ("g", 100.0)) ++ Seq(("g", 0.01), ("g", 99999.0))
    val out = RobustStats.winsorizedMeans(rows.toDF("k", "v"), "k", "v", 0.05, 0.95)
      .collect().head
    assert(out.getLong(1) == 100L)
    // raw mean is dragged ~1000 up by the tail; winsorized stays at 100
    assert(out.getDouble(2) > 1000.0)
    assert(out.getDouble(3) == 100.0)
  }

  test("co-occurrence counts pairs once per basket and caps basket size") {
    val rel = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // dup item in basket counts once
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L)
    ).toDF("b", "i")
    val out = Affinity.coOccurrence(rel, "b", "i", maxBasket = 20, k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((10L, 20L)) == 3L)
    assert(out((10L, 30L)) == 1L)
    assert(out((20L, 30L)) == 1L)
    // capping to 2 smallest items drops item 30 pairs entirely
    val capped = Affinity.coOccurrence(rel, "b", "i", maxBasket = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 20L)))
  }

  test("mutual information: zero for independent columns, ln k for copies") {
    import graft.operators.Profiler
    val indep = (0 until 400).map(i => (s"a${i % 4}", s"b${i % 5}")).toDF("x", "y")
    val miIndep = Profiler.mutualInformation(indep, "x", "y").collect().head
    assert(miIndep.getLong(0) == 400L)
    assert(math.abs(miIndep.getDouble(1)) < 1e-6)
    val copy = (0 until 300).map(i => (s"v${i % 3}", s"w${i % 3}")).toDF("x", "y")
    val miCopy = Profiler.mutualInformation(copy, "x", "y").collect().head
    assert(math.abs(miCopy.getDouble(1) - math.log(3)) < 1e-5)
  }

  test("empirical cdf matches cume_dist semantics including ties") {
    val df = Seq(10.0, 10.0, 20.0, 30.0, 30.0, 30.0, 40.0, 50.0, 60.0, 70.0).toDF("v")
    val cdf = RobustStats.empiricalCdf(df, "v")
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(cdf(10.0) == ((2L, 0.2)))
    assert(cdf(30.0) == ((6L, 0.6)))  // ties counted inclusively
    assert(cdf(70.0) == ((10L, 1.0)))
  }

  test("shingle novelty: copied docs score zero, unique docs score one") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact copy: zero novelty
      (3L, "omega psi chi phi upsilon")       // fully unique
    ).toDF("doc_id", "text")
    val out = Dedup.shingleNovelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0)
    assert(out(3L) == 1.0)
  }

  test("entropy: uniform vocab maxes out, constant text scores zero") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      ("u", "a b c d"), ("u", "e f g h"),            // 8 distinct tokens once each
      ("k", "x x x x"), ("k", "x x x x")             // one token repeated
    ).toDF("src", "text")
    val out = TextAnalysis.tokenEntropy(docs, "src", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("k") == ((8L, 1L, 0.0)))
    assert(math.abs(out("u")._3 - math.log(8)) < 1e-6)
  }

  test("vocab overlap: identical sources hit 1.0, disjoint sources emit no row") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      ("s1", "red green blue"), ("s2", "red green blue"),
      ("s3", "cyan magenta")
    ).toDF("src", "text")
    val out = TextAnalysis.vocabOverlap(docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out((("s1", "s2"))) == 1.0)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }

  test("pagerank: hub outranks leaves, ring is uniform, mass conserved-ish") {
    import graft.operators.Graph
    // star: node 0 connected to 1..10
    val star = (1 to 10).map(i => (0L, i.toLong)).toDF("s", "d")
    val starRanks = Graph.pageRankMicro(star, "s", "d", iters = 3, k = 11)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starRanks(0L) > starRanks(1L) * 5, s"hub not dominant: $starRanks")
    assert((1 to 10).map(i => starRanks(i.toLong)).distinct.size == 1)
    // ring: every node identical by symmetry, rank stays ~Scale
    val ring = (0 until 8).map(i => (i.toLong, ((i + 1) % 8).toLong)).toDF("s", "d")
    val ringRanks = Graph.pageRankMicro(ring, "s", "d", iters = 3, k = 8)
      .collect().map(_.getLong(1))
    assert(ringRanks.distinct.length == 1)
    assert(math.abs(ringRanks.head - Graph.Scale) < Graph.Scale / 100)
  }

  test("recall@k scores hits per query and keeps zero-recall queries") {
    import graft.operators.Similarity
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("qid", "nbr")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 98L), (2L, 97L))
      .toDF("qid", "nbr")
    val out = Similarity.recallAtK(exact, approx, "qid", "nbr", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.666667), (2L, 0L, 0.0)))
  }

  test("dsir: pool docs resembling the target domain outrank the rest") {
    val target = (1 to 30).map(i => (i.toLong, "alpha beta alpha beta gamma", true))
    val pool = Seq(
      (101L, "alpha beta alpha gamma beta", false), // target-like
      (102L, "delta epsilon delta epsilon zeta", false), // nothing shared
      (103L, "alpha delta epsilon zeta zeta", false) // mixed
    )
    val docs = (target ++ pool).toDF("doc_id", "text", "is_t")
    val out = Ranking.dsirLogWeights(docs, "doc_id", "text", col("is_t"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(101L, 103L, 102L))
    assert(out.head._2 > 0.0 && out.last._2 < 0.0)
  }

  test("cdc apply: latest wins, deletes drop, inserts add, NULL updates replace") {
    val snap = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("pk", "s", "v")
    val log = Seq(
      (2L, "b2", 21.0, 1L, "U"), (2L, "b3", 22.0, 2L, "U"), // latest wins
      (3L, "c", 30.0, 1L, "U"), (3L, "c", 30.0, 2L, "D"),   // net delete
      (5L, "e", 50.0, 1L, "I"),                             // insert
      (4L, null.asInstanceOf[String], 41.0, 1L, "U")        // NULL overwrites
    ).toDF("pk", "s", "v", "seq", "op")
    val out = Cdc.applyLog(snap, log, "pk", "seq", "op")
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L))
    assert(out(1L) == ((Some("a"), 10.0)))      // untouched passthrough
    assert(out(2L) == ((Some("b3"), 22.0)))     // seq 2 beat seq 1
    assert(out(4L) == ((None, 41.0)))           // NULL replaced, not coalesced
    assert(out(5L) == ((Some("e"), 50.0)))
  }

  test("pmi: exclusive pairs score positive, anti-associated pairs negative") {
    // items 1,2 always together; 1,3 never share a basket beyond chance
    val rel = (1 to 40).flatMap { b =>
      if (b % 2 == 0) Seq((b.toLong, 1L), (b.toLong, 2L))
      else Seq((b.toLong, 3L), (b.toLong, 4L))
    }.toDF("b", "i")
    val out = Affinity.pmiPairs(rel, "b", "i", maxBasket = 10, minCount = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // P(1,2)=0.5, P(1)=P(2)=0.5 -> pmi = ln(0.5/0.25) = ln 2
    assert(math.abs(out((1L, 2L)) - math.log(2)) < 1e-6)
    assert(math.abs(out((3L, 4L)) - math.log(2)) < 1e-6)
    assert(!out.contains((1L, 3L))) // never co-occur -> no pair row at all
  }

  test("equi-depth buckets are near-balanced and ordered") {
    val df = spark.range(1, 1001).select(col("id").cast("double").as("v"))
    val b = RobustStats.equiDepthBuckets(df, "v", nBuckets = 4).collect()
    assert(b.map(_.getLong(1)).sum == 1000L)
    // exact disc cutpoints on distinct values -> perfectly balanced here
    assert(b.forall(_.getLong(1) == 250L))
    // bucket value ranges must not overlap
    val ranges = b.map(r => (r.getDouble(2), r.getDouble(3)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
