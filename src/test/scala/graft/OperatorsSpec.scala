package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators._

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("normalizeText strips controls, folds accents, collapses whitespace") {
    val df = Seq(
      "  Héllo\t\twörld  ",
      "Ça\u000Bva", // vertical tab is a control char, stripped
      "already clean").toDF("t")
    val got = df.select(TextAnalysis.normalizeText(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("Hello world", "Cava", "already clean"))
  }

  test("kmeans: separates two obvious blobs regardless of seed vectors") {
    // ids 0,1 seed the two centroids; blob A hugs (1,0,...), blob B (0,1,...)
    def vec(main: Int, v: Float): Array[Float] = {
      val a = Array.fill(4)(0.01f); a(main) = v; a
    }
    val df = (
      Seq((0L, vec(0, 1.0f)), (1L, vec(1, 1.0f))) ++
        (2 to 10).map(i => (i.toLong, vec(0, 0.8f + 0.02f * i))) ++
        (11 to 20).map(i => (i.toLong, vec(1, 0.7f + 0.01f * i))))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    // blob A = seed 0 + ids 2-10; blob B = seed 1 + ids 11-20
    assert((Seq(0L) ++ (2L to 10L)).forall(got(_) == 0L), s"blob A split: $got")
    assert((Seq(1L) ++ (11L to 20L)).forall(got(_) == 1L), s"blob B split: $got")
  }

  test("asof backward: latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:10"), "e1"),
      (1L, ts("2024-01-01 00:00:05"), "e2"),
      (1L, ts("2024-01-01 00:00:03"), "e3"),
      (2L, ts("2024-01-01 00:00:07"), "e4"))
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:05"), "a"),
      (1L, ts("2024-01-01 00:00:08"), "b"),
      (2L, ts("2024-01-01 00:00:09"), "c"))
      .toDF("rk", "rt", "v")
    val inner = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("ev", "v").as[(String, String)].collect().toMap
    // e1 -> b (08 <= 10); e2 -> a (inclusive at 05); e3, e4 unmatched
    assert(inner == Map("e1" -> "b", "e2" -> "a"))
    val outer = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("v"),
      inner = false)
    assert(outer.count() == 4)
    assert(outer.filter(col("v").isNull).count() == 2)
  }

  test("asof: a matched right row with NULL columns is not torn") {
    // right at t=5 has (x=1, y=2); right at t=8 has (x=9, y=NULL).
    // A left row at t=10 must get (9, NULL) — not a composite (9, 2).
    val left = Seq((1L, ts("2024-01-01 00:00:10"), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:05"), Some(1L), Some(2L)),
      (1L, ts("2024-01-01 00:00:08"), Some(9L), None))
      .toDF("rk", "rt", "x", "y")
    val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("x", "y"))
      .select("x", "y").collect()(0)
    assert(got.getLong(0) == 9L && got.isNullAt(1))
  }

  test("space-saving merge keeps the overestimate invariant across evictions") {
    import graft.functions.SpaceSavingBuffer
    // reviewer scenario: C's mass passes through an eviction; merged
    // estimate must stay within [truth, truth+err]
    val b1 = new SpaceSavingBuffer(2)
    b1.counts ++= Seq("A" -> ((10L, 0L)), "B" -> ((9L, 0L)))
    val b2 = new SpaceSavingBuffer(2)
    b2.counts ++= Seq("A" -> ((1L, 0L)), "C" -> ((8L, 0L)))
    val b3 = new SpaceSavingBuffer(2)
    b3.counts ++= Seq("C" -> ((8L, 0L)))
    b1.merge(b2)
    b1.merge(b3)
    val truth = Map("A" -> 11L, "B" -> 9L, "C" -> 16L)
    b1.counts.foreach { case (k, (c, e)) =>
      assert(c >= truth(k) && c - truth(k) <= e, s"$k: cnt=$c err=$e truth=${truth(k)}")
    }
    // the true heaviest item (C=16) is present and ranked first
    assert(b1.counts.toSeq.maxBy(_._2._1)._1 == "C")
  }

  test("asof: NULL keys and times follow theta-join semantics (never match)") {
    val left = Seq(
      (Some(1L), Some(ts("2024-01-01 00:00:10")), "e1"),
      (None, Some(ts("2024-01-01 00:00:10")), "e2"),     // null key
      (Some(1L), None, "e3"))                            // null time
      .toDF("k", "t", "ev")
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 00:00:05")), "a"),
      (None, Some(ts("2024-01-01 00:00:01")), "nullkey"), // must be inert
      (Some(1L), None, "nulltime"))                       // must be inert
      .toDF("rk", "rt", "v")
    val inner = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("ev", "v").as[(String, String)].collect().toMap
    assert(inner == Map("e1" -> "a"))
    val outer = AsOfJoin.backward(left, right, "k", "rk", "t", "rt", Seq("v"),
      inner = false)
    assert(outer.count() == 3)
    assert(outer.filter(col("v").isNull).count() == 2) // e2, e3 unmatched
  }

  test("asof latestPerKeyTime dedups right side deterministically") {
    val r = Seq((1L, ts("2024-01-01 00:00:05"), 100L),
      (1L, ts("2024-01-01 00:00:05"), 200L)).toDF("k", "t", "id")
    val got = AsOfJoin.latestPerKeyTime(r, "k", "t", "id")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(200L))
  }

  test("sessionize: gap splits sessions, counts and bounds are right") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:01:40"), 2L),
      (1L, ts("2024-01-01 00:33:20"), 3L), // 1900s gap > 1800s -> new session
      (2L, ts("2024-01-01 00:00:00"), 4L))
      .toDF("user_id", "t", "event_id")
    val got = Sessionize.sessions(ev, "user_id", "t", 1800, "event_id")
      .orderBy("user_id", "start_us")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("exact dedup keeps the smallest id per key") {
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y")).toDF("id", "k")
    val got = Dedup.exact(df, Seq("k"), "id").select("id").as[Long]
      .collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("minhash: identical texts collide, lsh finds the pair, jaccard = 1") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words make another doc here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 9)
    assert(sigs.count() == 3)
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", k = 9, bands = 3)
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
    val jp = Dedup.jaccardNearDupPairs(docs, "doc_id", "text", threshold = 0.9)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(jp == Seq((1L, 2L, 1.0)))
  }

  test("simhash: identical token multisets share fingerprints") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same multiset, different order
      (3L, "omega psi chi phi"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash16(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L).length == 16 && fp(1L).forall(c => c == '0' || c == '1'))
  }

  test("cosine: identity and orthogonality") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      df.filter(col("vec_id") === 1), df, "vec_id", "embedding", k = 2)
      .select("rank", "nbr", "sim").as[(Long, Long, Double)].collect().toSeq
    assert(top.head == ((1L, 3L, 1.0))) // parallel vector first
    assert(top(1)._2 == 2L && math.abs(top(1)._3) < 1e-12)
  }

  test("sign-bucket near-dup finds same-direction vectors") {
    val df = Seq(
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (2L, Array(0.51f, 0.49f, 0.5f, 0.5f)),
      (3L, Array(-0.5f, 0.5f, -0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.signBucketNearDupPairs(df, "vec_id", "embedding",
      bucketDims = 4, threshold = 0.9)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("asof forward: earliest right row at-or-after left time") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:10"), "e1"),
      (1L, ts("2024-01-01 00:00:05"), "e2"),
      (2L, ts("2024-01-01 00:00:07"), "e4"))
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:05"), "a"),
      (1L, ts("2024-01-01 00:00:08"), "b"),
      (2L, ts("2024-01-01 00:00:06"), "c"))
      .toDF("rk", "rt", "v")
    val got = AsOfJoin.forward(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select("ev", "v").as[(String, String)].collect().toMap
    // e1(10) -> none; e2(5) -> a (inclusive); e4(7) -> none (c is at 6)
    assert(got == Map("e2" -> "a"))
  }

  test("salted join equals the plain join") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "lv")
    val right = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "rv")
    val salted = Joins.saltedEquiJoin(left, right, "k", salts = 4)
      .select("k", "lv", "rv").as[(Long, String, Int)].collect().sorted.toSeq
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").as[(Long, String, Int)].collect().sorted.toSeq
    assert(salted == plain && plain.size == 4)
  }

  test("ivf top-k: probing the right cell finds the exact neighbor") {
    // centroids are ids 0 and 1 (nCells = 2); 10/11 cluster with 0,
    // 20/21 with 1
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.95f, 0.05f)),
      (20L, Array(0.1f, 0.9f)), (21L, Array(0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(
      df.filter(col("vec_id") === 10), df, "vec_id", "embedding",
      k = 1, nCells = 2, nProbe = 1)
      .select("qid", "nbr").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 11L)))
  }

  test("bucketed interval join equals the naive theta join") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-03 10:00:00"), "e2"),
      (2L, ts("2024-01-01 10:00:00"), "e3"))
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), "w1"),
      (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"), "w2"),
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"), "w3"))
      .toDF("rk", "ws", "we", "win")
    val got = operators.RangeJoin.bucketedIntervalJoin(
        left, right, "k", "rk", "t", "ws", "we", Seq("win"), bucketSeconds = 3600)
      .select("ev", "win").as[(String, String)].collect().toSet
    // e1 in w1 and w2; e2 and e3 match nothing
    assert(got == Set(("e1", "w1"), ("e1", "w2")))
  }

  test("text analysis: tokens, stopword ratio, lang id, fingerprint") {
    val df = Seq(
      (1L, "the cat sat on a mat"),
      (2L, "el gato que de la casa"),
      (3L, "zzz yyy xxx")).toDF("id", "text")
    val got = df.select(
      col("id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(got(1L)._1 == 6 && got(1L)._2 == "en")
    assert(got(2L)._2 == "es")
    assert(got(3L)._2 == "und")
    // fingerprint is whitespace/case-normalized
    val fp2 = Seq((9L, "  THE   cat sat on a MAT "))
      .toDF("id", "text")
      .select(TextAnalysis.fingerprint(col("text"))).as[String].collect()(0)
    assert(fp2 == got(1L)._3)
  }

  test("doc pipeline: quality filter, exact dedup, near-dup removal compose") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "s1"),
      (2L, "the quick brown fox jumps over the lazy dog today", "s1"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog yesterday", "s1"), // near dup of 1
      (4L, "too short", "s2"), // fails minTokens
      (5L, "a completely different document with many other novel words inside", "s2"))
      .toDF("doc_id", "text", "source")
    val kept = operators.DocPipeline.clean(docs, "doc_id", "text",
      operators.DocPipeline.Config(minTokens = 5, jaccardThreshold = 0.3))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 5L))
    // redaction masks emails and long digit runs
    val red = Seq((1L, "mail me at a.b@x.co or call 123456789 ok"))
      .toDF("id", "t")
      .select(operators.DocPipeline.redact(col("t"))).as[String].collect()(0)
    assert(red == "mail me at <EMAIL> or call <NUM> ok")
  }

  test("space-saving top-k: exact when under capacity, bounded when over") {
    import graft.functions.SpaceSavingTopK.topkFreq
    // 3 distinct values, frequencies 5/3/1, capacity 8 -> exact,
    // across 4 partitions to force sketch merges
    val data = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("v").repartition(4)
    val exact = data.agg(topkFreq(col("v"), 3, 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(exact == Seq(("a", 5L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)))

    // capacity 2 with 3 distinct: counts may overestimate but never by
    // more than err, and the true heavy hitter stays on top
    val approx = data.coalesce(1).agg(topkFreq(col("v"), 2, 2).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(approx.head._1 == "a")
    approx.foreach { case (item, cnt, err) =>
      val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 1L)(item)
      assert(cnt >= truth && cnt - truth <= err,
        s"$item: cnt=$cnt truth=$truth err=$err")
    }
  }

  test("deterministic sampling: stable, disjoint splits, plausible rates") {
    val ids = spark.range(10000).toDF("id")
    val s1 = operators.Sampling.deterministicSample(ids, "id", 0.3)
      .as[Long].collect().toSet
    val s2 = operators.Sampling.deterministicSample(ids, "id", 0.3)
      .as[Long].collect().toSet
    assert(s1 == s2, "same fraction+salt must select the same rows")
    assert(math.abs(s1.size - 3000) < 200, s"got ${s1.size} of ~3000")
    // a larger fraction is a superset of a smaller one (same salt)
    val s3 = operators.Sampling.deterministicSample(ids, "id", 0.6)
      .as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    val splits = operators.Sampling.assignSplit(ids, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.values.sum == 10000)
    assert(math.abs(splits("train") - 8000) < 200)
    assert(math.abs(splits("val") - 1000) < 120)
  }

  test("token-budget sample keeps a stable hash-prefix per group within budget") {
    val docs = Seq(
      (1L, "a", 40L), (2L, "a", 40L), (3L, "a", 40L), (4L, "a", 40L),
      (5L, "b", 25L), (6L, "b", 1000L), (7L, "c", 10L)
    ).toDF("id", "src", "toks")
    val kept = operators.Sampling
      .tokenBudgetSample(docs, "id", "src", "toks", budget = 100L)
      .select("id").as[Long].collect().toSet
    val again = operators.Sampling
      .tokenBudgetSample(docs, "id", "src", "toks", budget = 100L)
      .select("id").as[Long].collect().toSet
    assert(kept == again, "selection must be deterministic")
    // group a: 4 docs x 40 tokens — exactly 2 fit in 100
    assert(kept.count(Set(1L, 2L, 3L, 4L)) == 2)
    // group b: the 1000-token doc can never fit; if it hashes first it
    // cuts the whole group off (prefix semantics), so at most doc 5
    // survives and doc 6 never does
    assert(!kept.contains(6L))
    assert(kept.count(Set(5L, 6L)) <= 1)
    // group c fits entirely
    assert(kept.contains(7L))
    // schema passthrough: helper columns dropped
    val cols = operators.Sampling
      .tokenBudgetSample(docs, "id", "src", "toks", budget = 100L).columns.toSeq
    assert(cols == Seq("id", "src", "toks"))
  }

  test("bigram LM scores scrambled text below prose with the same vocabulary") {
    val prose = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (1L, prose), (2L, prose), (3L, prose),
      // same tokens, scrambled order: rare bigrams -> lower logprob
      (4L, "mat the on sat cat rug and dog the on the sat the")
    ).toDF("doc_id", "text")
    val got = operators.Ranking.bigramLogProb(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(4L)._2 < got(1L)._2, s"scrambled must score lower: $got")
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    // 13 tokens -> 12 bigrams
    assert(got(1L)._1 == 12L)
    // single-token and empty docs produce no bigrams and no row
    val tiny = Seq((1L, "word"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val rows = operators.Ranking.bigramLogProb(tiny, "doc_id", "text", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(3L))
  }

  test("simhash incremental probe finds the copied doc, band blocking is lossless") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy of 1
      (11L, "totally different words that share nothing at all here")
    ).toDF("doc_id", "text")
    val got = operators.Dedup
      .simhashIncrementalPairs(base, incoming, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the copy has hamming 0 to its original
    assert(got.contains((10L, 1L, 0L)), s"got ${got.toSeq}")
    // every reported pair honors the threshold
    assert(got.forall(_._3 <= 3))
    // blocking must agree with the unblocked check: recompute by brute force
    val sh = operators.Dedup.simhash16(base.unionByName(incoming), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val brute = for {
      n <- Seq(10L, 11L); b <- Seq(1L, 2L)
      h = hamming(sh(n), sh(b)) if h <= 3
    } yield (n, b, h.toLong)
    assert(got.toSet == brute.toSet)
  }

  test("simhash64: banded incremental probe is lossless and discriminative") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 1
      (11L, "totally different words that share nothing at all here"),
      (12L, "one two three four five six seven eight nine ten")  // copy of 2
    ).toDF("doc_id", "text")
    val got = operators.Dedup
      .simhash64IncrementalPairs(base, incoming, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // banding (4x16-bit bands) must agree with the unblocked check
    val sh = operators.Dedup.simhash64(base.unionByName(incoming), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh.values.forall(_.length == 64))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val brute = (for {
      n <- Seq(10L, 11L, 12L); b <- Seq(1L, 2L, 3L)
      h = hamming(sh(n), sh(b)) if h <= 3
    } yield (n, b, h.toLong)).toSet
    assert(got == brute, s"got $got brute $brute")
    // copies collide at 0; UNRELATED docs must be far apart on 64 bits
    // (the 16-bit fingerprint puts most of this fixture within 3)
    assert(got.contains((10L, 1L, 0L)) && got.contains((12L, 2L, 0L)))
    assert(!got.exists(p => p._1 == 11L), s"unrelated doc must not match: $got")
  }

  test("duplicate-5-gram char fraction: repeated text high, unique text zero") {
    val looped = Seq.fill(4)("one two three four five").mkString(" ")
    val unique = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, looped), (2L, unique), (3L, "too short")).toDF("doc_id", "text")
    val got = operators.TextAnalysis.dupNgramCharFrac(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // 20 tokens -> 16 grams; the loop makes most of them repeat
    assert(got(1L)._1 == 16L)
    assert(got(1L)._2 > 0.5, s"looped text must be mostly duplicated: ${got(1L)}")
    // all grams unique -> zero duplicated characters
    assert(got(2L)._2 == 0.0)
    // < 5 tokens -> no grams, no row
    assert(!got.contains(3L))
  }

  test("decontamination flags docs sharing an 8-gram with the eval set") {
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix words alpha beta gamma delta epsilon zeta eta theta trailer"),
      (11L, "completely unrelated content with its own eight gram run here"))
      .toDF("doc_id", "text")
    val got = operators.Decontaminate.flagContaminated(corpus, evalSet, "doc_id", "text", 8)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(10L))
    assert(got(10L) == 1L) // "alpha beta ... theta" is the one shared 8-gram
  }

  test("profiler computes per-column stats in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("c")))
      .toDF("id", "s")
    val got = operators.Profiler.profile(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((3L, 0L, 2L, "1", "2")))
    assert(got("s") == ((3L, 1L, 2L, "a", "c")))
  }

  test("simhash pair join: integer band/bit_count path equals brute-force Hamming") {
    // deterministic random 64-bit signatures plus planted near pairs —
    // the integer-decode rework must reproduce exact brute-force
    // results, including pairs found via multiple bands (dedup) and
    // the lossless-for-hamming<=3 pigeonhole guarantee
    val rnd = new scala.util.Random(7)
    def randSig() = (1 to 64).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
    def flipBits(s: String, k: Int): String = {
      val idx = rnd.shuffle((0 until 64).toList).take(k).toSet
      s.zipWithIndex.map { case (c, i) =>
        if (idx(i)) (if (c == '1') '0' else '1') else c }.mkString
    }
    val base = (1L to 40L).map(i => (i, randSig()))
    val incoming = base.take(10).zipWithIndex.map { case ((bid, s), k) =>
      (100L + bid, flipBits(s, k % 4)) // hamming 0..3 from a base sig
    } ++ (200L until 220L).map(i => (i, randSig()))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val expected = (for {
      (nid, ns) <- incoming; (oid, os) <- base
      h = ham(ns, os) if h <= 3
    } yield (nid, oid, h.toLong)).toSet
    val got = Dedup.simhashIncrementalPairsFromSigs(
        base.toDF("doc_id", "simhash"), incoming.toDF("doc_id", "simhash"),
        "doc_id", maxHamming = 3, sigChars = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"extra=${got -- expected}, missing=${expected -- got}")
    assert(expected.size >= 10, "planted near pairs must be present")
  }

  test("simhash pair join: width mismatch raises loudly, nulls still drop silently") {
    // a 16-char signature against the 64-bit default used to conv to
    // NULL words and silently emit zero pairs — now every caller fails
    val short = Seq((1L, "0101010101010101")).toDF("doc_id", "simhash")
    val e = intercept[Exception] {
      Dedup.simhashIncrementalPairsFromSigs(short, short, "doc_id").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("simhash width mismatch")),
      s"unexpected error chain: ${msgs(e)}")
    // the same table is fine when the width is declared, and null
    // signatures are dropped (not raised on) either way
    val withNull = Seq((1L, "0101010101010101"), (2L, null))
      .toDF("doc_id", "simhash")
    val ok = Dedup.simhashIncrementalPairsFromSigs(
      withNull, withNull, "doc_id", sigChars = 16).collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L)))
  }

  test("multimodal: real ImageIO encode/decode round-trips the fixture spec") {
    val ids = Seq(0L, 1L, 2L, 7L, 12L).toDF("id")
    val got = Multimodal
      .decodeImageFeatures(Multimodal.fixtureImages(ids, "id"), "id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got.size == 5)
    Seq(0L, 1L, 2L, 7L, 12L).foreach { id =>
      val s = Multimodal.fixtureSpec(id)
      val bot = s.h - s.top
      val expected = (
        s.w.toLong, s.h.toLong,
        s.w.toLong * (s.top * s.ar + bot * s.br),
        s.w.toLong * (s.top * s.ag + bot * s.bg),
        s.w.toLong * (s.top * s.ab + bot * s.bb),
        s.w.toLong * (math.abs(s.ar - s.br) + math.abs(s.ag - s.bg) +
          math.abs(s.ab - s.bb)))
      assert(got(id) == expected, s"id=$id spec=$s")
    }
    // both codecs exercised: even ids PNG, odd ids BMP — magic bytes
    val magic = Multimodal.fixtureImages(ids, "id")
      .select("id", "bytes").as[(Long, Array[Byte])].collect().toMap
    assert(magic(0L).take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(magic(7L).take(2).toSeq == Seq[Byte]('B', 'M'))
    // decode is robust to junk: undecodable rows are dropped, not fatal
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("id", "bytes")
    assert(Multimodal.decodeImageFeatures(junk, "id").count() == 0)
  }

  test("multimodal: grid hash matches the analytic fixture formula and a hand-built gradient") {
    // fixture path: hash bits must equal the closed-form derivation
    // from the two-band spec (the same arithmetic the oracle replays)
    val ids = Seq(0L, 1L, 5L, 13L, 42L).toDF("id")
    val got = Multimodal.imageGridHash(Multimodal.fixtureImages(ids, "id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq(0L, 1L, 5L, 13L, 42L).foreach { id =>
      val s = Multimodal.fixtureSpec(id)
      val ga = s.ar + s.ag + s.ab; val gb = s.br + s.bg + s.bb
      val totalSum = s.w.toLong * (s.top * ga + (s.h - s.top) * gb)
      val totalPx = s.w.toLong * s.h
      val bits = (for (i <- 0 until 8; j <- 0 until 8) yield {
        val rLo = i * s.h / 8; val rHi = (i + 1) * s.h / 8
        val nCols = ((j + 1) * s.w / 8 - j * s.w / 8).toLong
        val nRows = (rHi - rLo).toLong
        val nTop = math.max(0L, math.min(s.top, rHi).toLong - rLo)
        val cellSum = (nTop * ga + (nRows - nTop) * gb) * nCols
        if (nRows * nCols > 0 && cellSum * totalPx >= totalSum * (nRows * nCols)) '1'
        else '0'
      }).mkString
      assert(got(id) == bits, s"id=$id spec=$s")
    }
    // non-band image: a vertical gradient must split top-dark /
    // bottom-bright around the mean — top rows 0, bottom rows 1
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = y * 16 // 0..240, strictly increasing by row
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val gradHash = Multimodal.imageGridHash(
        Seq((7L, bos.toByteArray)).toDF("id", "bytes"), "id")
      .collect().head.getString(1)
    // rows 0..15 have gray 3*16*y; mean row value = 7.5 -> grid rows
    // 0..3 (pixel rows 0..7) below the mean, 4..7 at/above
    assert(gradHash == "0" * 32 + "1" * 32, gradHash)
  }

  test("multimodal: grid fixtures plant exact hamming-1 twins, others far") {
    val ids = ((0L until 10L) ++ (120L until 125L)).toDF("id")
    val hashes = Multimodal.imageGridHash(
        Multimodal.gridFixtureImages(ids, "id", base = 120L), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    (120L until 125L).foreach { nid =>
      assert(ham(hashes(nid), hashes(nid % 120)) == 1,
        s"incoming $nid must be one flipped cell from base ${nid % 120}")
      ((0L until 10L).filterNot(_ == nid % 120)).foreach { other =>
        assert(ham(hashes(nid), hashes(other)) > 3,
          s"$nid vs unrelated $other must be far")
      }
    }
  }

  test("multimodal: nearest-neighbor resize samples exact source pixels") {
    // 4x2 image with distinct pixel values; resize to 2x2 must pick
    // source (x*4/2, y*2/2) = columns 0,2 of both rows — no blending
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val vals = Array(
      Array(0x010101, 0x020202, 0x030303, 0x040404),
      Array(0x050505, 0x060606, 0x070707, 0x080808))
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, vals(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val resized = Multimodal.resizeImages(
        Seq((1L, bos.toByteArray)).toDF("id", "bytes"), "id", 2, 2)
      .collect().head.getAs[Array[Byte]]("bytes")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 2 && back.getHeight == 2)
    assert((back.getRGB(0, 0) & 0xffffff) == 0x010101)
    assert((back.getRGB(1, 0) & 0xffffff) == 0x030303)
    assert((back.getRGB(0, 1) & 0xffffff) == 0x050505)
    assert((back.getRGB(1, 1) & 0xffffff) == 0x070707)
    // junk bytes drop, not fatal
    assert(Multimodal.resizeImages(
      Seq((9L, Array[Byte](9, 9))).toDF("id", "bytes"), "id", 2, 2).count() == 0)
  }

  test("multimodal: WAV decode matches hand-computed sample statistics") {
    // fixture path: features must equal the closed-form sawtooth stats
    val got = Multimodal.decodeAudioFeatures(
        Multimodal.audioFixtures(Seq(3L, 7L).toDF("id"), "id", n = 500), "id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    Seq(3L, 7L).foreach { id =>
      val samples = (0 until 500).map(t => (((id * 37 + t * 17) % 2048) - 1024).toInt)
      val zc = samples.sliding(2).count { case Seq(a, b) =>
        (a < 0 && b >= 0) || (a >= 0 && b < 0) }
      assert(got(id) == ((8000L, 500L, samples.map(v => math.abs(v).toLong).sum,
        samples.map(v => math.abs(v).toLong).max, zc.toLong)), s"id=$id")
    }
    // junk bytes drop, not fatal
    assert(Multimodal.decodeAudioFeatures(
      Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("id", "bytes"), "id").count() == 0)
  }

  test("multimodal: video frames carry one cell of motion per step") {
    val frames = Multimodal.videoFrameFixtures(
        Seq(5L).toDF("id"), "id", nFrames = 4, everyMs = 100L)
      .select((col("id") * 10000 + col("frame_ms")).as("fk"), col("bytes"))
    val feats = Multimodal.decodeImageFeatures(frames, "fk")
      .collect()
      .map(r => (r.getLong(0) % 10000) -> r.getLong(3)) // frame_ms -> sum_r
      .sortBy(_._1)
    assert(feats.map(_._1).toSeq == Seq(0L, 100L, 200L, 300L))
    // one flipped black/white cell changes the channel sum by exactly
    // 255 * 16 pixels between consecutive frames
    feats.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(math.abs(a - b) == 255L * 16, s"$a -> $b")
    }
  }

  test("multimodal: frame sampling plumbing") {
    val media = Multimodal.fromText(
      Seq((1L, "hello world")).toDF("id", "text"), "id", "text")
    assert(media.schema("bytes").dataType.typeName == "binary")
    // duration 11 bytes, every 5 -> offsets 0,5,10
    val frames = Multimodal.frameSample(media.filter(col("media_id") === 1), 5)
    assert(frames.select("frame_ms").as[Long].collect().toSeq == Seq(0L, 5L, 10L))
  }
}
