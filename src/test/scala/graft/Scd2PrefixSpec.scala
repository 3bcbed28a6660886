package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PrefixSum, Scd2, TextAnalysis}

class Scd2PrefixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scd2: unchanged/updated/deleted/inserted keys emit the right versions") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
    val nu = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0))
      .toDF("k", "status", "price")
    val got = Scd2.fromSnapshots(old, nu, "k", Seq("status", "price"))
      .select("k", "price", "valid_from", "valid_to", "is_current")
      .as[(Long, Double, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, 10.0, 1L, None, true),          // unchanged: one open row
      (2L, 20.0, 1L, Some(2L), false),     // updated: old closed...
      (2L, 25.0, 2L, None, true),          // ...new open
      (3L, 30.0, 1L, Some(2L), false),     // deleted: closed
      (4L, 40.0, 2L, None, true)))         // inserted: open at batch 2
  }

  test("distributed prefix sum equals the single-partition window") {
    val df = (1 to 997).map(i => (i.toLong, ((i * 37) % 101).toLong))
      .toDF("id", "v").repartition(7)
    val got = PrefixSum.runningSum(df, Seq(col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val expected = df
      .withColumn("cum", sum("v").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got(997L) == (1 to 997).map(i => (i * 37) % 101).sum)
  }

  test("prefix sum respects a descending order with tiebreaker") {
    val df = Seq((1L, 5L, 100L), (2L, 5L, 10L), (3L, 9L, 1L))
      .toDF("id", "score", "v")
    val got = PrefixSum.runningSum(df,
        Seq(col("score").desc, col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // order: id3 (score 9), id1 (score 5, id tiebreak), id2
    assert(got == Map(3L -> 1L, 1L -> 101L, 2L -> 111L))
  }

  test("packing: each doc lands in the bin of its first token, overflow allowed") {
    // tokens: 800, 800, 800, 5000, 100 -> first-token offsets 0, 800, 1600,
    // 2400, 7400 -> bins 0, 0, 1, 2, 7 with capacity 1000
    val df = Seq((1L, 800L), (2L, 800L), (3L, 800L), (4L, 5000L), (5L, 100L))
      .toDF("doc_id", "n")
    val got = PrefixSum.packBins(df, Seq(col("doc_id")), "n", 1000L)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 7L))
  }

  test("chunk plan: split-across-boundaries placement, zero-token docs dropped") {
    // stream (seqLen 10): doc1 [0,8), doc2 [8,23) spans chunks 0..2,
    // doc4 [23,30) stays in chunk 2, doc5 [30,40) fills chunk 3 exactly
    val df = Seq((1L, 8L), (2L, 15L), (3L, 0L), (4L, 7L), (5L, 10L))
      .toDF("doc_id", "n")
    val got = PrefixSum.chunkPlan(df, Seq(col("doc_id")), "n", 10L)
      .select("doc_id", "chunk_first", "chunk_last", "n_chunks", "offset_in_chunk")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((0L, 0L, 1L, 0L)),
      2L -> ((0L, 2L, 3L, 8L)),
      4L -> ((2L, 2L, 1L, 3L)),
      5L -> ((3L, 3L, 1L, 0L))), got.toString)
    assert(!got.contains(3L), "zero-token doc contributes nothing")
    // invariants on a larger random-ish stream: offsets bounded,
    // consecutive docs abut (next start == prev cum)
    val big = (1L to 300L).map(i => (i, (i * 7) % 23 + 1)).toDF("doc_id", "n")
    val plan = PrefixSum.chunkPlan(big, Seq(col("doc_id")), "n", 50L)
      .orderBy("doc_id")
      .select("doc_id", "n", "chunk_first", "chunk_last", "offset_in_chunk")
      .as[(Long, Long, Long, Long, Long)].collect()
    var cum = 0L
    plan.foreach { case (_, n, cf, cl, off) =>
      assert(cf * 50 + off == cum, "doc starts where the previous ended")
      assert(off >= 0 && off < 50)
      assert(cl == (cum + n - 1) / 50)
      cum += n
    }
  }

  test("priority sample equals the naive JVM computation exactly") {
    import graft.operators.Sampling
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = (1 to 200).map(i => (i.toLong, (i % 17 + 1).toLong))
    val expected = rows.map { case (id, w) =>
      val x = md5hex(s"ps:$id").take(8).foldLeft(0L)((acc, c) =>
        acc * 16 + Character.digit(c, 16))
      (id, w, w.toDouble / ((x + 1).toDouble / 4294967296.0))
    }.sortBy { case (id, _, p) => (-p, id) }.take(10)
      .map { case (id, w, p) => id -> ((w, p)) }.toMap
    val got = Sampling.prioritySample(rows.toDF("id", "w"), "id", "w", 10)
      .select("id", "w", "priority").as[(Long, Long, Double)].collect()
      .map { case (id, w, p) => id -> ((w, p)) }.toMap
    assert(got == expected)
  }

  test("token chunks: overlap, stride, and short-document fallback") {
    val doc10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc10), (2L, "only three tokens")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenChunks(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .select("doc_id", "chunk_id", "n_tokens")
      .as[(Long, Long, Long)].collect().toSet
    // doc 1: starts 0,3,6 -> chunks of 4,4,4 (tokens 1-4, 4-7, 7-10);
    // the start at 9 is dropped: tokens 10 is already fully covered
    assert(got == Set(
      (1L, 0L, 4L), (1L, 1L, 4L), (1L, 2L, 4L),
      (2L, 0L, 3L)))  // shorter than one chunk: single short chunk
  }

  test("token chunks: a trailing remainder gets its own short chunk") {
    // 11 tokens, chunkSize 4, stride 3: starts 0,3,6 cover tokens 1-10,
    // token 11 is only reached by the tail chunk at start 9
    val doc11 = (1 to 11).map(i => s"t$i").mkString(" ")
    val got = TextAnalysis.tokenChunks(
        Seq((1L, doc11)).toDF("doc_id", "text"), "doc_id", "text", 4, 3)
      .select("chunk_id", "n_tokens").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 4L), (1L, 4L), (2L, 4L), (3L, 2L)))
  }
}
