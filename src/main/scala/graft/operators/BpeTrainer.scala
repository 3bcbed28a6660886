package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge training over a corpus (Sennrich, Haddow
  * & Birch, ACL'16 "Neural Machine Translation of Rare Words with
  * Subword Units") — the TOKENIZER-TRAINING step of a pretraining
  * pipeline, complementing the tokenizer-APPLICATION operators
  * (q27/q38/q73): learn the first `nMerges` merge rules from corpus
  * statistics.
  *
  * Scale shape: the corpus is read ONCE into a persisted
  * (word, freq) table — the classic BPE reduction, because pair
  * statistics depend only on word shapes and their frequencies, and
  * distinct words are orders of magnitude fewer than tokens. Each
  * merge round is then one map (split the symbol string) + one
  * partial-aggregated pair count over that table, and collects ONE
  * row (the argmax pair) to the driver — `nMerges` bounded scalar
  * actions, the same driver-loop pattern as Lloyd k-means
  * ([[Similarity.kmeansCentroids]]). Nothing quadratic, nothing
  * proportional to corpus size after the first pass.
  *
  * Merge application semantics (deliberate, documented): the chosen
  * pair is applied with a literal space-padded string replace —
  * left-to-right, non-overlapping, scanning the ORIGINAL string. In
  * an alternating run (`a b a b`) the second occurrence's shared
  * boundary space is consumed by the first match, so ONE pass merges
  * `ab a b` rather than textbook BPE's `ab ab`; the remaining
  * occurrence merges in a later round if the pair stays frequent.
  * Both engines implement `replace` with the same original-scan rule,
  * so the oracle reproduces every round bit-for-bit — determinism is
  * the property the harness needs, and the learned merge table
  * differs from textbook BPE only in the order alternating runs
  * resolve.
  *
  * Output: `(merge_rank, lhs, rhs, cnt)` — the merge table a
  * tokenizer ships, ranked 1..nMerges; ties on count break
  * lexicographically on the pair string. End-of-word is the `_`
  * marker symbol (appended to every word), so merges can learn word
  * suffixes.
  */
object BpeTrainer {

  /** Lineage/plan truncation cadence for the iterative replace chains
    * (training rounds and [[applyMerges]]): small enough that neither
    * the re-executed prefix nor the nested-expression plan ever grows
    * past a few dozen replaces, large enough that an 8-merge call
    * never pays a checkpoint.
    */
  val PersistEvery = 16

  /** Vocabulary-size bound for the single-collect trainer: below this
    * many distinct words, [[trainMerges]] collects the (symbols, freq)
    * table once and runs the whole greedy merge loop on the driver —
    * ONE Spark job instead of `nMerges` argmax collects (plus the
    * replace-chain re-executions between them). This is how production
    * BPE trainers are built (HF tokenizers, sentencepiece: distributed
    * word counting, LOCAL merge loop — pair statistics depend only on
    * word shapes × frequencies, a vocabulary-sized object), and it is
    * the q167 job-count diet applied to the suite's worst driver-loop
    * amplification family (r16: q151 7.8×, q153 8.6×, q186 11.5× on a
    * degraded scheduler — every extra barrier stretched). At ~60 bytes
    * per padded word, 4M words ≈ 250 MB driver heap: collectable on
    * any driver that runs this trainer. Above the bound the original
    * distributed per-round loop runs instead ([[trainMergesDistributed]]
    * — same greedy chain, so the two paths are output-identical;
    * BpeSpec asserts it).
    */
  val MaxDriverVocab: Long = 4000000L

  def trainMerges(
      docs: DataFrame,
      textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be positive")
    val spark = docs.sparkSession
    // one corpus pass: token occurrence frequencies in padded-symbol
    // form — the ONLY corpus-sized work of BPE training
    val wf = docs
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // " h e l l o _ " — space-padded char symbols + end-of-word marker
      .select(concat(lit(" "),
          regexp_replace(col("word"), "(.)", "$1 "), lit("_ ")).as("s"),
        col("freq"))
    // the vocab gate rides the same single job: collect up to the
    // bound + 1 rows; an overflow falls back to the distributed loop
    // (its first action re-runs the corpus pass — the rare path pays
    // one extra job, the common path saves nMerges of them)
    val head = wf.limit((MaxDriverVocab + 1).toInt).collect()
    if (head.length > MaxDriverVocab)
      return trainMergesDistributed(docs, textCol, nMerges)
    trainMergesLocal(spark,
      head.map(r => (r.getString(0), r.getLong(1))), nMerges)
  }

  /** The driver-side greedy merge loop over a collected (symbols,
    * freq) vocabulary — exactly [[trainMergesDistributed]]'s chain:
    * adjacent-pair counts weighted by word frequency, argmax by
    * (count desc, pair asc in UTF-8 BINARY order — Spark's string
    * ordering, which plain Java String comparison would get wrong for
    * supplementary characters), literal space-padded left-to-right
    * non-overlapping replace (Java's `String.replace` and Spark's
    * `replace` share that scan rule). Package-private for the BpeSpec
    * equivalence case.
    */
  private[graft] def trainMergesLocal(
      spark: SparkSession,
      vocab: Array[(String, Long)],
      nMerges: Int): DataFrame = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    var words = vocab
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = new java.util.HashMap[String, Long]()
      words.foreach { case (s, f) =>
        val toks = s.trim.split(" ")
        var i = 0
        while (i < toks.length - 1) {
          counts.merge(toks(i) + " " + toks(i + 1), f, (a: Long, b: Long) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestPair: String = null
        var bestCnt = Long.MinValue
        counts.forEach { (p, c) =>
          if (c > bestCnt || (c == bestCnt &&
              java.util.Arrays.compareUnsigned(
                p.getBytes(utf8), bestPair.getBytes(utf8)) < 0)) {
            bestPair = p; bestCnt = c
          }
        }
        val Array(lhs, rhs) = bestPair.split(" ", 2)
        merges += ((rank.toLong, lhs, rhs, bestCnt))
        words = words.map { case (s, f) =>
          (s.replace(s" $bestPair ", s" $lhs$rhs "), f)
        }
        rank += 1
      }
    }
    import spark.implicits._
    spark.createDataFrame(merges.result())
      .toDF("merge_rank", "lhs", "rhs", "cnt")
  }

  /** The original distributed per-round loop — one pair-count argmax
    * job per merge over the persisted vocabulary table. Kept as the
    * over-bound fallback of [[trainMerges]] and as the equivalence
    * oracle for the driver-side loop (BpeSpec runs both).
    */
  private[graft] def trainMergesDistributed(
      docs: DataFrame,
      textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // one corpus pass: token occurrence frequencies
    val wf = docs
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // " h e l l o _ " — space-padded char symbols + end-of-word marker
      .select(concat(lit(" "),
          regexp_replace(col("word"), "(.)", "$1 "), lit("_ ")).as("s"),
        col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var cur = wf
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    try {
      for (rank <- 1 to nMerges) {
        val toks = split(trim(col("s")), " ")
        val top = cur
          // fully-merged single-symbol words carry no pairs; without
          // the guard, sequence(0, -1) runs DESCENDING in Spark
          // (DuckDB's generate_series(1, 0) is just empty) and the
          // element_at probe throws under ANSI
          .filter(size(toks) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(0), size(toks) - 2),
            i => concat_ws(" ",
              element_at(toks, i + 1), element_at(toks, i + 2)))).as("pr"))
          .groupBy("pr").agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("pr"))
          .limit(1)
          .collect()
        if (top.isEmpty) {
          // every word reduced to a single symbol — nothing left to merge
          return spark.createDataFrame(merges.result())
            .toDF("merge_rank", "lhs", "rhs", "cnt")
        }
        val pair = top.head.getString(0)
        val cnt = top.head.getLong(1)
        val Array(lhs, rhs) = pair.split(" ", 2)
        merges += ((rank.toLong, lhs, rhs, cnt))
        cur = cur.select(
          replace(col("s"), lit(s" $pair "), lit(s" $lhs$rhs ")).as("s"),
          col("freq"))
        // each round's action re-executes every prior round's replace
        // over the word table and the logical plan grows one node per
        // round — linear plan, quadratic total work/analysis once
        // nMerges is large. localCheckpoint truncates both every
        // PersistEvery rounds (eager: the cost is one materialization
        // of a vocab-sized table; blocks are freed by the caller's
        // session cleanup, same as any persisted intermediate).
        if (rank % PersistEvery == 0 && rank < nMerges)
          cur = cur.localCheckpoint(true)
      }
      spark.createDataFrame(merges.result())
        .toDF("merge_rank", "lhs", "rhs", "cnt")
    } finally wf.unpersist(false)
  }

  /** The space-padded symbol form every BPE stage operates on:
    * `" h e l l o _ "` for word `hello` — shared by training and
    * encoding so the two cannot drift.
    */
  private def padSymbols(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "), lit("_ "))

  /** ENCODING — the other half of the tokenizer: apply a trained
    * merge table to a frame carrying a padded symbol column `s`,
    * replaying the merges in rank order with the same literal
    * space-padded `replace` the trainer used (so training and
    * encoding agree symbol-for-symbol; the round-trip is
    * property-tested in BpeSpec). One projection per merge, collapsed
    * by Catalyst into a single pass over the frame; the chain is
    * lineage-truncated every [[PersistEvery]] merges so a
    * production-sized merge table (tens of thousands) neither nests
    * an unboundedly deep expression nor re-analyzes a growing plan.
    */
  def applyMerges(
      wordSyms: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var cur = wordSyms
    merges.zipWithIndex.foreach { case ((lhs, rhs), i) =>
      cur = cur.withColumn("s",
        replace(col("s"), lit(s" $lhs $rhs "), lit(s" $lhs$rhs ")))
      if ((i + 1) % PersistEvery == 0 && i + 1 < merges.size)
        cur = cur.localCheckpoint(true)
    }
    cur
  }

  /** Corpus-level BPE vocabulary statistics under a trained merge
    * table: `(token, token_id, cnt)` where `cnt` is the token's total
    * occurrence count across the corpus and `token_id` ranks by
    * (cnt desc, token) — the id assignment a tokenizer ships.
    *
    * Scale shape: the corpus reduces to the distinct-word table
    * (the same reduction training uses — merge work is proportional
    * to VOCABULARY, not corpus); the final rank is a global window,
    * which is safe here BY CONSTRUCTION: every output token is either
    * a base character, the end-of-word marker, or one of the
    * `nMerges` merged symbols, so the ranked table is at most
    * |alphabet| + nMerges + 1 rows regardless of corpus size.
    */
  def encodeTokenCounts(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wf = docs
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(padSymbols(col("word")).as("s"), col("freq"))
    val enc = applyMerges(wf, merges)
    enc.select(explode(split(trim(col("s")), " ")).as("token"), col("freq"))
      .groupBy("token").agg(sum(col("freq")).as("cnt"))
      .withColumn("token_id", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .select(col("token"), col("token_id"), col("cnt"))
  }

  /** Per-document token counts under a trained merge table:
    * `(idCol, n_bpe_tokens)` — the number every token-budget /
    * packing stage needs, computed WITHOUT materializing per-document
    * token arrays: merges run once over the distinct-word table, each
    * word's encoded length joins back to the corpus's (doc, word)
    * occurrences by hash equi-join, and a doc-keyed sum finishes.
    * Documents with no tokens emit 0 (left join + coalesce).
    */
  def encodeDocTokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val occ = docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("word"))
    val perWord = applyMerges(
        occ.select(col("word")).distinct()
          .select(col("word"), padSymbols(col("word")).as("s")), merges)
      .select(col("word"),
        size(split(trim(col("s")), " ")).cast("long").as("__n"))
    val counts = occ.join(perWord, "word")
      .groupBy(col(idCol)).agg(sum(col("__n")).as("__tok"))
    docs.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__tok"), lit(0L)).as("n_bpe_tokens"))
  }
}
