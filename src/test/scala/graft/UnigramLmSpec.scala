package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnigramViterbiExpr
import graft.operators.UnigramLm

/** Unigram-LM tokenizer: the Viterbi DP kernel's argmax/tie/unk
  * contract, block-boundary semantics, and the train/encode chains on
  * hand-computable corpora.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vocab(ps: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    ps.foreach { case (p, s) => m.put(p, s) }
    m
  }

  private def seg(block: String, v: java.util.HashMap[String, java.lang.Long]): String =
    UnigramViterbiExpr.segment(
      UTF8String.fromString(block), v, UnigramLm.MaxPieceLen,
      UnigramLm.UnkLogp9Nano).toString

  test("Viterbi picks the higher-scoring segmentation") {
    val v = vocab("a" -> -1000000000L, "b" -> -1000000000L, "ab" -> -1500000000L)
    assert(seg("ab", v) == "ab", "-1.5 beats a+b = -2.0")
    assert(seg("aab", v) == "a ab", "-2.5 beats a+a+b = -3.0")
  }

  test("equal-score tie breaks to the longer last piece") {
    val v = vocab("a" -> -1000000000L, "b" -> -1000000000L, "ab" -> -2000000000L)
    // 'ab' and 'a b' both total -2.0; length wins
    assert(seg("ab", v) == "ab")
  }

  test("code point outside the vocabulary emits itself as UNK at the pinned score") {
    val v = vocab("a" -> -1000000000L, "b" -> -1000000000L)
    assert(seg("axb", v) == "a x b")
    // the unk path still competes on score: a 4-char piece over the
    // known chars beats per-char only if its score says so
    val v2 = vocab("a" -> -1000000000L, "axba" -> -2000000000L, "b" -> -1000000000L)
    assert(seg("axba", v2) == "axba", "one -2.0 piece beats a,-20,b,a = -23.0")
  }

  test("greedy-longest is NOT the rule: DP backtracks past a tempting prefix") {
    // greedy would take 'abc' then pay unk for 'd'; DP finds ab+cd
    val v = vocab("abc" -> -1000000000L, "ab" -> -2000000000L,
      "cd" -> -2000000000L, "a" -> -3000000000L, "b" -> -3000000000L,
      "c" -> -3000000000L, "d" -> -3000000000L)
    assert(seg("abcd", v) == "ab cd", "-4.0 beats abc+d = -4.0? no: abc+d = -1-3 = -4.0 ties -> longer LAST piece is d(1) vs cd(2): cd wins")
  }

  test("blocksOf cuts at 12 code points; segmentation cannot span the cut") {
    val word = "a" * 11 + "ab" // 13 chars: block1 = 12 a's, block2 = "b"
    val blocks = Seq(Tuple1(word)).toDF("word")
      .select(UnigramLm.blocksOf(col("word")).as("bs"))
      .head().getSeq[String](0)
    assert(blocks == Seq("a" * 12, "b"))
  }

  test("trainUnigram: seed select, hard-EM recount, and logp9 over the recounted total") {
    // corpus: "abab abab cd" x1 -> words: abab(x2... within one doc)
    val docs = Seq(Tuple1("abab abab cd")).toDF("text")
    val out = UnigramLm.trainUnigram(docs, "text", nMulti = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // seed counts (freq-weighted): word freqs abab:2 cd:1; multi
    // substrings of abab (freq 2): ab x2*2, ba x2, aba x2, bab x2,
    // abab x2 -> top-2 multis by (cnt desc, piece asc): ab(4), then
    // aba/abab/ba/bab all cnt 2 -> 'aba'. singles: a(4),b(4),c(1),d(1)
    // Viterbi on 'abab' under seed scores: 'ab ab' (two high-count
    // pieces) beats 'aba b' and per-char; 'cd' -> 'c d'
    // recount: ab: 2*2=4, c:1, d:1 -> total 6
    assert(out.keySet == Set("ab", "c", "d"))
    assert(out("ab") == 4L && out("c") == 1L && out("d") == 1L)
  }

  test("encodeDocTokens: per-doc piece counts, mean log-prob, empty doc -> 0/NULL") {
    val docs = Seq((1L, "abab cd"), (2L, ""), (3L, "abab abab"))
      .toDF("doc_id", "text")
    val model = UnigramLm.trainUnigram(
      Seq(Tuple1("abab abab cd")).toDF("text"), "text", nMulti = 2)
    val out = UnigramLm.encodeDocTokens(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    // doc 1: abab -> 'ab ab' (2 pieces), cd -> 'c d' (2) = 4 pieces
    assert(out(1L)._1 == 4L)
    assert(out(2L) == ((0L, None)), "token-free doc: 0 pieces, NULL logprob")
    assert(out(3L)._1 == 4L)
    // doc 3 is two copies of 'abab': mean = logp9(ab), exactly
    val lp = model.filter(col("piece") === "ab")
      .select(col("logp9").cast("double")).head().getDouble(0)
    assert(math.abs(out(3L)._2.get - BigDecimal(lp)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("segmentBlocks runs the expression through a real plan (codegen path)") {
    val nano = Seq("a" -> -1000000000L, "b" -> -1000000000L, "ab" -> -1500000000L)
    val out = UnigramLm.segmentBlocks(
        Seq("ab", "aab", "axb").toDF("block"), nano)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("ab" -> "ab", "aab" -> "a ab", "axb" -> "a x b"))
  }
}
