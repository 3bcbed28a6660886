package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramViterbi

/** SentencePiece-style unigram language-model tokenizer (Kudo, ACL'18
  * "Subword Regularization: Improving Neural Network Translation
  * Models with Multiple Subword Candidates") — the OTHER production
  * tokenizer family next to BPE ([[BpeTrainer]]): a piece VOCABULARY
  * with log-probabilities, trained by substring seeding plus hard-EM
  * (Viterbi) re-estimation, applied by Viterbi segmentation.
  *
  * Scale shape mirrors the BPE reduction one level deeper: all
  * per-character work happens on the distinct BLOCK table (words cut
  * into [[BlockChars]]-code-point windows — distinct blocks are fewer
  * than distinct words, which are orders of magnitude fewer than
  * token occurrences), and every corpus-sized step is a plain
  * explode/groupBy/equi-join. The Viterbi DP itself is ONE codegen
  * Catalyst node per distinct block ([[graft.functions.UnigramViterbi]])
  * with the model-sized vocabulary riding the plan as a reference
  * object — never a driver loop, never a collect of corpus-sized
  * state, so the trainer is a fixed FOUR-job chain (seed-vocab
  * collect + recount) regardless of corpus size: the job-count-diet
  * discipline ([[BpeTrainer.MaxDriverVocab]]'s motivation) by
  * construction rather than by fallback.
  *
  * Deliberate, documented simplifications vs full SentencePiece (each
  * keeps the algorithm deterministic and oracle-replayable):
  *
  *  - segmentation never crosses a [[BlockChars]]-code-point block
  *    boundary (bounds the DP unroll the DuckDB oracle replays; with
  *    pieces ≤ [[MaxPieceLen]] chars, only pieces spanning a cut are
  *    lost, and words under 13 chars — virtually all — are one block);
  *  - ONE hard-EM round (Viterbi counts) instead of iterated
  *    soft-EM + prune-by-likelihood-loss: seed counts → top-K
  *    vocabulary → segment → recount → final probabilities; pieces
  *    the Viterbi pass never uses fall out of the vocabulary;
  *  - a code point outside the vocabulary emits itself as an UNK
  *    piece at the fixed score [[UnkLogp9Nano]] (SentencePiece's
  *    unk_surface, with a pinned penalty instead of a learned one).
  *
  * Determinism: piece log-probs are `round(ln(cnt/total), 9)` as
  * decimal(18,9) — the engine-wide one-ln-per-term convention
  * ([[Ranking.unigramLogProb]]) — and the DP sums them as exact
  * integer nanonats, so the engines' float orders can never disagree;
  * argmax ties break on longer-piece-first (same-length ties are the
  * same substring, hence impossible).
  */
object UnigramLm {

  /** Code points per DP block — the oracle unrolls exactly this many
    * dp steps, so it is a cross-engine contract, not a tuning knob.
    */
  val BlockChars = 12

  /** Longest piece the vocabulary may hold (code points). */
  val MaxPieceLen = 4

  /** Fixed UNK-piece score in nanonats (= -20.000000000 log-prob —
    * below any realistic piece, above Long-sum overflow territory).
    */
  val UnkLogp9Nano: Long = -20000000000L

  /** `-20.000000000` as the decimal(18,9) literal the score joins
    * coalesce unknown pieces to (the oracle writes the same literal).
    */
  private def unkLogp9: Column =
    (lit(UnkLogp9Nano) / lit(1000000000L)).cast("decimal(18,9)")

  /** (word, freq) occurrence frequencies — the classic tokenizer-
    * trainer reduction: everything downstream depends only on word
    * shapes × frequencies.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The [[BlockChars]]-code-point windows of a word, in order. */
  def blocksOf(word: Column): Column = {
    val w = word
    // sequence over block indices; substring is code-point based in
    // both engines (DuckDB substr counts code points too)
    transform(
      sequence(lit(0), ((length(w) - lit(1)) / lit(BlockChars)).cast("int")),
      i => w.substr(i * BlockChars + 1, lit(BlockChars)))
  }

  /** (block, freq) — block occurrence frequencies, multiplicity-aware
    * (a 24-char word contributes BOTH its blocks, equal or not).
    */
  def blockFreq(words: DataFrame): DataFrame =
    words.select(explode(blocksOf(col("word"))).as("block"), col("freq"))
      .groupBy("block").agg(sum("freq").as("freq"))

  /** Seed-substring counts: every 1..[[MaxPieceLen]]-code-point
    * substring of every block, weighted by block frequency. The
    * token-array discipline ([[Dedup]] scaladoc): the block and its
    * length bind in their own projection so the nested transform
    * slices bound values instead of recomputing them per element.
    */
  def seedPieceCounts(blocks: DataFrame): DataFrame =
    blocks
      .select(col("block"), col("freq"), length(col("block")).as("__n"))
      .select(col("freq"), explode(flatten(transform(
        sequence(lit(1), col("__n").cast("int")),
        i => transform(
          sequence(lit(1), least(lit(MaxPieceLen), (col("__n") - i + 1).cast("int"))),
          l => col("block").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Seed vocabulary: ALL single code points (coverage — every block
    * must segment) plus the top `nMulti` multi-character substrings
    * by (count desc, piece asc).
    */
  def seedVocab(seed: DataFrame, nMulti: Int): DataFrame = {
    val singles = seed.filter(length(col("piece")) === 1)
    val multis = seed.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(nMulti)
    singles.unionByName(multis)
  }

  /** Attach `logp9 = round(ln(cnt/total), 9)` decimal(18,9) scores,
    * total = the table's own count sum (broadcast 1-row join).
    */
  def withLogp9(vocab: DataFrame): DataFrame = {
    val total = vocab.agg(sum("cnt").as("__total"))
    vocab.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__total")), 9)
          .cast("decimal(18,9)").as("logp9"))
  }

  /** Collect a scored vocabulary to (piece, nanonats) for the DP
    * reference object — model-sized by construction (the PQ-codebook
    * collect discipline), exact because logp9 is decimal scale 9.
    */
  def collectNano(scored: DataFrame): Seq[(String, Long)] =
    scored.select(col("piece"),
        (col("logp9") * lit(1000000000L)).cast("long").as("nano"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** (block, path) Viterbi segmentations of a distinct-block table
    * under a nanonat vocabulary — one codegen node per row.
    */
  def segmentBlocks(blocks: DataFrame, nano: Seq[(String, Long)]): DataFrame =
    blocks.select(col("block"),
      UnigramViterbi.segment(col("block"), nano, MaxPieceLen, UnkLogp9Nano)
        .as("path"))

  /** Train the unigram vocabulary: seed → top-K select → one Viterbi
    * hard-EM recount → final (piece, cnt, logp9), pieces the EM pass
    * used, ordered by piece. Four Spark jobs total, none proportional
    * to corpus size past the first scan.
    */
  def trainUnigram(docs: DataFrame, textCol: String, nMulti: Int): DataFrame = {
    val spark = docs.sparkSession
    val bf = blockFreq(wordFreq(docs, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nano0 = collectNano(withLogp9(seedVocab(seedPieceCounts(bf), nMulti)))
      val paths = segmentBlocks(bf.select("block"), nano0)
      // hard-EM recount: path pieces weighted by block frequency; the
      // inner join back to the seed vocabulary drops unk emissions
      // (their code point was, by definition, never a vocab piece)
      val recount = paths.join(bf, "block")
        .select(col("freq"), explode(split(col("path"), " ")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .join(broadcast(
          spark.createDataFrame(nano0).toDF("piece", "__n0").select("piece")),
          "piece")
      withLogp9(recount).orderBy("piece")
    } finally { bf.unpersist(false); () }
  }

  /** Per-block piece count and exact decimal score sum under a scored
    * vocabulary: the block-level metrics every encode aggregates from.
    * Unknown pieces (present in paths, absent from the vocabulary)
    * score [[unkLogp9]].
    */
  private def blockMetrics(paths: DataFrame, scored: DataFrame): DataFrame =
    paths
      .select(col("block"), explode(split(col("path"), " ")).as("piece"))
      .join(scored.select(col("piece"), col("logp9")), Seq("piece"), "left")
      .groupBy("block")
      .agg(count(lit(1)).as("__np"),
        sum(coalesce(col("logp9"), unkLogp9)).as("__slp"))

  /** Viterbi-encode every document under a trained vocabulary:
    * (id, n_pieces, logprob = round(mean piece log-prob, 6)), NULL
    * logprob for token-free documents, ordered by id. Distinct blocks
    * segment once; per-word and per-doc rollups are exact decimal
    * sums ([[Ranking.unigramLogProb]]'s scheme one level down).
    */
  def encodeDocTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      scored: DataFrame): DataFrame = {
    val id = col(idCol)
    val nano = collectNano(scored)
    val occ = docs.select(id, explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val words = occ.groupBy("word").agg(count(lit(1)).as("__occ"))
    val wblocks = words
      .select(col("word"), col("__occ"), explode(blocksOf(col("word"))).as("block"))
    val bm = blockMetrics(
      segmentBlocks(wblocks.select("block").distinct(), nano), scored)
    // word-level: sum of block metrics WITH multiplicity (a repeated
    // block inside one word counts each occurrence)
    val wm = wblocks.join(bm, "block")
      .groupBy("word")
      .agg(first("__occ").as("__occ"),
        sum("__np").as("__wnp"), sum("__slp").as("__wslp"))
    val dm = occ.join(wm.select("word", "__wnp", "__wslp"), "word")
      .groupBy(id)
      .agg(sum(col("__wnp")).as("n_pieces"),
        sum(col("__wslp")).as("__dslp"))
    docs.select(id).join(dm, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(col("n_pieces").isNull, lit(null).cast("double"))
          .otherwise(round(col("__dslp").cast("double") / col("n_pieces"), 6))
          .as("logprob"))
      .orderBy(id)
  }

  /** Persist a trained vocabulary as the stored tokenizer artifact
    * (one model-sized parquet table; the caller writes the corpus
    * stamp beside it — the stored-artifact freshness discipline).
    */
  def writeUnigramArtifact(scored: DataFrame, path: String): Unit =
    scored.write.mode("overwrite").parquet(s"$path/pieces")

  def readUnigramArtifact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pieces")
}
