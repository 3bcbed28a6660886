package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches
import graft.operators.{Decontaminate, Sampling, TextAnalysis, TfIdf}

class SketchesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bloom filter: no false negatives, folds into a filter plan") {
    val members = (1 to 1000).map(i => s"item$i").toDF("v")
    val bloom = Sketches.buildBloom(members, col("v"), 1000)
    val probe = (500 to 1500).map(i => s"item$i").toDF("v")
    val kept = probe.filter(Sketches.mightContain(lit(bloom), col("v")))
      .as[String].collect().toSet
    // every true member must survive (Bloom filters cannot false-negative)
    (500 to 1000).foreach(i => assert(kept.contains(s"item$i")))
    // false positives are allowed but must be rare at this fpp
    val fps = kept.count(_.drop(4).toInt > 1000)
    assert(fps < 50, s"implausible false-positive count: $fps")
  }

  test("bloom decontamination equals exact decontamination") {
    val corpus = (10 to 60).map(i =>
      (i.toLong, s"uniq$i " * 3 + (if (i % 7 == 0) "copy me verbatim eight words long exactly here now" else "filler words piling up to reach shingle size threshold")))
      .toDF("doc_id", "text")
    val eval = Seq((1L, "copy me verbatim eight words long exactly here now")).toDF("doc_id", "text")
    val exact = Decontaminate.flagContaminated(corpus, eval, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bloomed = Decontaminate.flagContaminatedBloom(corpus, eval, "doc_id", "text", n = 8, expectedShingles = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(bloomed == exact)
    assert(exact.nonEmpty)
  }

  test("count-min sketch never underestimates and respects the eps bound") {
    val words = (1 to 20000).map(i => s"w${i % 300}")
    val df = words.toDF("w")
    val eps = 0.001
    val sketch = Sketches.buildCountMin(df, col("w"), eps, 0.999, 7)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.take(50).foreach { case (w, n) =>
      val est = sketch.estimateCount(w)
      assert(est >= n, s"$w underestimated: $est < $n")
      assert(est <= n + (2 * eps * words.size).toLong, s"$w overestimated: $est vs $n")
    }
  }

  test("tf-idf ranks a document's distinctive term first") {
    val docs = Seq(
      (1L, "apple apple apple common common"),
      (2L, "banana banana common common common"),
      (3L, "cherry cherry cherry common common")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top(1L) == "apple" && top(2L) == "banana" && top(3L) == "cherry")
  }

  test("gopher flags: short and symbol-heavy docs rejected, prose kept") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog again and again today"),
      (2L, "too short"),
      (3L, "the 111 222 333 444 555 666 777 888 999 000 111 222"),
      (4L, ""), (5L, "   ")).toDF("id", "text")
    val got = docs.select(col("id"),
        TextAnalysis.gopherFlags(col("text"), minTokens = 10).getField("keep").as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(got(1L))
    assert(!got(2L)) // below token floor
    assert(!got(3L)) // digit tokens sink the alpha ratio
    // empty/whitespace docs: ANSI mode must not throw on the 0-token
    // ratios; the verdict is a plain reject
    assert(!got(4L) && !got(5L))
  }

  test("profiler: -0.0 counts once, matching COUNT(DISTINCT) semantics") {
    val df = Seq(0.0, -0.0, 1.5).toDF("d")
    val prof = graft.operators.Profiler.profile(df, Seq("d"))
      .select("n_distinct").as[Long].head()
    val exact = df.select(countDistinct(col("d"))).as[Long].head()
    assert(prof == exact, s"profiler $prof vs countDistinct $exact")
  }

  test("dup clusters: min-label propagation finds connected components") {
    import graft.operators.Dedup
    val docs = (1L to 10L).toDF("id")
    // components: {1,2,3,4} (a chain, needs multiple rounds), {7,8},
    // rest singletons; (11,12) are edge endpoints absent from docs —
    // both paths must still label them identically
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (11L, 12L))
      .toDF("d1", "d2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L, 10L -> 10L,
      11L -> 11L, 12L -> 11L)
    // small-graph fast path (driver union-find)
    val got = Dedup.dupClusters(docs, pairs, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // distributed label-propagation path, forced by a zero threshold —
    // both paths must agree on the same graph
    val distributed = Dedup.dupClustersCached(docs, pairs, "id",
      smallGraphEdges = 0)
    assert(distributed.df.as[(Long, Long)].collect().toMap == expected)
    distributed.unpersist()
  }

  test("url normalization strips query/fragment, lowercases host, drops trailing slash") {
    val df = Seq(
      "HTTPS://Example.COM/Path/?q=1#frag",
      "https://example.com/Path",
      "http://example.com//").toDF("u")
    val got = df.select(TextAnalysis.normalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == Seq(
      "https://example.com/Path",
      "https://example.com/Path",
      "http://example.com"))
  }

  test("observe metrics ride along with the action, no extra pass") {
    import graft.operators.Metrics
    val docs = Seq((1L, "the quick fox"), (2L, ""), (3L, "a b"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val (observed, obs) = Metrics.observeCorpus(docs, "text")
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_docs") == 4L)
    assert(m("n_tokens") == 5L)
    assert(m("min_tokens") == 0L && m("max_tokens") == 3L)
    // null text is junk too, not a skipped row
    assert(m("n_empty") == 2L)
  }

  test("compaction writes the targeted number of output files") {
    import graft.operators.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").resolve("t").toString
    val df = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(37)
    val rows = Compaction.writeCompacted(df, dir, targetRowsPerFile = 2500)
    assert(rows == 10000L)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 4, s"expected 4 output files, got $files")
    assert(spark.read.parquet(dir).count() == 10000L)
  }

  test("compaction keeps NULL-partition rows and spreads a hot value") {
    import graft.operators.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").resolve("t").toString
    // hot partition value "a" (3000 rows), tiny "b" (10), NULL day (5)
    val df = ((1 to 3000).map(i => (i.toLong, Some("a"))) ++
        (1 to 10).map(i => (3000L + i, Some("b"))) ++
        (1 to 5).map(i => (4000L + i, Option.empty[String])))
      .toDF("id", "day")
    val rows = Compaction.writeCompacted(df, dir, targetRowsPerFile = 1000,
      partitionBy = Seq("day"))
    assert(rows == 3015L)
    val back = spark.read.parquet(dir)
    // NULL-day rows land in the default partition, not dropped
    assert(back.count() == 3015L)
    assert(back.filter(col("day").isNull).count() == 5L)
    // the hot value is spread across multiple right-sized files
    val aFiles = new java.io.File(s"$dir/day=a").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(aFiles >= 2, s"hot partition written as $aFiles file(s)")
  }

  test("stratified sample keeps each stratum at its own rate") {
    val df = (1 to 4000).map(i => (i.toLong, s"s${i % 2}")).toDF("id", "src")
    val kept = Sampling.stratifiedSample(df, "id", "src",
        Map("s0" -> 1.0, "s1" -> 0.25))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("s0") == 2000)
    assert(math.abs(kept("s1") - 500L) < 120, s"s1 kept ${kept("s1")}")
    // default fraction 0.0 drops unknown strata entirely
    val dropped = Sampling.stratifiedSample(df, "id", "src", Map("zz" -> 1.0))
    assert(dropped.count() == 0)
  }
}
