package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning: the composition layer a training-data
  * pipeline runs over raw documents. Stages (all lazy, one logical
  * plan):
  *
  *   1. normalize: trim + collapse whitespace + lowercase fingerprint
  *   2. quality filter: token-count and stopword-ratio bounds
  *   3. exact dedup on the normalized fingerprint (min-id wins)
  *   4. near-dup removal: MinHash-LSH candidates -> exact Jaccard
  *      >= threshold -> drop the higher id of each surviving pair
  *
  * Near-dup removal keeps the LOWER id of every duplicate pair — a
  * deterministic greedy policy (no clustering pass), matching what
  * most production dedup jobs do between snapshots.
  */
object DocPipeline {

  final case class Config(
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      minStopRatio: Double = 0.0,
      jaccardThreshold: Double = 0.5)

  /** PII-style redaction: emails and long digit runs are masked. The
    * pattern set is deployment-specific; these two are the
    * demonstration set (RE2-portable patterns).
    */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "[0-9]{7,}", "<NUM>")
  }

  /** Kept documents after the full cleaning chain. Returns the input
    * rows (original columns) of surviving documents.
    */
  def clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()): DataFrame =
    cleanCached(docs, idCol, textCol, cfg).df

  /** [[clean]] plus the persisted dedup intermediates. Long-lived
    * sessions that clean corpus after corpus should call
    * `.unpersist()` on the result after their terminal action, or the
    * cached shingle/signature blocks accumulate across invocations.
    */
  def cleanCached(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()): Dedup.CachedDF = {
    val nTokens = TextAnalysis.tokenCount(col(textCol))
    val stopR = TextAnalysis.stopwordRatio(col(textCol))
    val quality = docs
      .filter(nTokens >= cfg.minTokens && nTokens <= cfg.maxTokens &&
        stopR >= cfg.minStopRatio)
    val exact = Dedup.exact(
      quality.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp")
    val nearDup = Dedup.jaccardNearDupPairsCached(
      exact, idCol, textCol, threshold = cfg.jaccardThreshold)
    val nearDupLosers = nearDup.df.select(col("d2").as(idCol)).distinct()
    val kept = exact.join(nearDupLosers, Seq(idCol), "left_anti")
    Dedup.CachedDF(kept, nearDup.handles)
  }
}
