package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

/** BPE merge training: frequency-weighted pair argmax, lexicographic
  * tie-break, and the documented one-pass-per-round semantics on
  * alternating runs.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def merges(text: String, n: Int) =
    BpeTrainer.trainMerges(Seq(Tuple1(text)).toDF("text"), "text", n)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("frequency-weighted argmax across words; merged symbol feeds later rounds") {
    // wf: aab x2, ab x1 -> round 1: (a,b) cnt 3 beats (a,a) cnt 2
    // (tie with (b,_) cnt 3 breaks lexicographically to "a b");
    // round 2: the NEW symbol "ab" pairs with _ in all 3 words
    val out = merges("aab aab ab", 2)
    assert(out.toSeq == Seq((1L, "a", "b", 3L), (2L, "ab", "_", 3L)))
  }

  test("alternating run: one replace pass merges one occurrence, the next round catches the rest") {
    val out = merges("abab", 2)
    assert(out(0) == ((1L, "a", "b", 2L)), "both (a,b) occurrences counted")
    assert(out(1) == ((2L, "a", "b", 1L)),
      "the boundary-consumed occurrence survives to round 2 (documented replace semantics)")
  }

  test("driver-side merge loop is output-identical to the distributed per-round loop") {
    // the round-17 job-count diet: trainMerges collects the vocabulary
    // once and runs the greedy chain locally; the distributed per-round
    // argmax loop is the semantics oracle. A corpus with frequency
    // ties (lexicographic break), alternating runs (replace-scan
    // semantics) and multi-round merged-symbol reuse must come out
    // bit-identical through both paths
    val corpus = Seq(
      Tuple1("lower lowest newer newest wider widest low new abab aab"),
      Tuple1("the newer model is wider and the lowest is newest abab"),
      Tuple1("low low lower lowest new newer newest aab ab ba")).toDF("text")
    val viaLocal = BpeTrainer.trainMerges(corpus, "text", 10)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val viaDistributed = BpeTrainer.trainMergesDistributed(corpus, "text", 10)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(viaLocal == viaDistributed)
  }

  test("round trip: train -> encode -> detokenize recovers every normalized word") {
    val corpus = Seq(
      Tuple1("lower lowest newer newest wider widest low new"),
      Tuple1("the newer model is wider and the lowest is newest"),
      Tuple1("low low lower lowest new newer newest")).toDF("text")
    val m = BpeTrainer.trainMerges(corpus, "text", 12)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // every distinct corpus word, encoded then detokenized (symbols
    // concatenated, end-of-word marker stripped), must equal itself —
    // merges only regroup symbols, never lose or reorder characters
    import org.apache.spark.sql.functions._
    val words = corpus
      .select(explode(graft.operators.Dedup.tokens(col("text"))).as("word"))
      .distinct()
    val enc = BpeTrainer.applyMerges(
      words.select(col("word"),
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "), lit("_ ")).as("s")),
      m)
    val bad = enc.filter(
      regexp_replace(replace(col("s"), lit(" "), lit("")), "_$", "") =!= col("word"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
    // and at least one real merge happened (the fixture's suffix
    // family guarantees multi-char tokens exist)
    val nSyms = enc.select(sum(size(split(trim(col("s")), " ")))).head.getLong(0)
    val nChars = enc.select(sum(length(col("word")) + 1)).head.getLong(0)
    assert(nSyms < nChars, "encoding must compress vs char-level")
  }

  test("per-doc token counts: join-back equals direct per-doc encode") {
    val docs = Seq(
      (1L, "low lower lowest"),
      (2L, "new newer newest wider"),
      (3L, ""),
      (4L, "low low low")).toDF("doc_id", "text")
    val m = BpeTrainer.trainMerges(docs, "text", 6)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = BpeTrainer.encodeDocTokenCounts(docs, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    // empty doc emits 0, repeated words count each occurrence
    assert(out(3L) == 0L)
    assert(out(4L) > 0 && out(4L) % 3 == 0,
      "three identical words -> count divisible by 3")
    // cross-check totals against the corpus-level encode
    val vocabTotal = BpeTrainer.encodeTokenCounts(docs, "text", m)
      .agg(sum(col("cnt"))).head.getLong(0)
    assert(out.values.sum == vocabTotal,
      "per-doc counts and vocabulary counts tally the same corpus")
  }

  test("merging exhausts: single-char words stop the loop early") {
    val out = merges("a a b", 2)
    // " a _ " x2 and " b _ ": round 1 merges (a,_) cnt 2; round 2 merges (b,_) cnt 1
    assert(out.length == 2)
    assert(out(0) == ((1L, "a", "_", 2L)))
    assert(out(1) == ((2L, "b", "_", 1L)))
    // all words now single symbols: a third round returns only 2 rows
    assert(merges("a a b", 5).length == 2, "loop stops when no pairs remain")
  }
}
