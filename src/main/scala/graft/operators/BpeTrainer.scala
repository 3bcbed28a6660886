package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def trainMerges(
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
      }
      spark.createDataFrame(merges.result())
        .toDF("merge_rank", "lhs", "rhs", "cnt")
    } finally wf.unpersist(false)
  }
}
