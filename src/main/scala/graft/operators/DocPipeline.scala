package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-stage attrition accounting for a sequential filter cascade —
    * the report every curation run publishes: how many documents each
    * stage saw, dropped, and passed on, with per-stage and cumulative
    * rates. Stages apply IN ORDER: a document is charged to the FIRST
    * stage whose predicate it fails (later stages never see it), so the
    * per-stage numbers chain exactly (`n_out` of stage i = `n_in` of
    * stage i+1).
    *
    * One scan: each row maps to its first-failing stage index, one
    * partial-aggregated groupBy over ≤ stages+1 groups, and the funnel
    * arithmetic (a running sum) runs on that stage-count table — rows
    * never shuffle, whatever the corpus size.
    *
    * Output: `(stage_idx, stage, n_in, n_dropped, n_out, drop_rate,
    * cum_kept_rate)`, one row per stage.
    */
  def attritionReport(
      docs: DataFrame,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val spark = docs.sparkSession
    import spark.implicits._
    val firstFail = stages.zipWithIndex.foldRight(lit(null).cast("long")) {
      case (((_, cond), i), acc) => when(!cond, lit(i.toLong)).otherwise(acc)
    }
    val byFail = docs.select(firstFail.as("__ff"))
      .groupBy("__ff").agg(count(lit(1)).as("__n"))
    val total = byFail.agg(coalesce(sum(col("__n")), lit(0L)).as("__total"))
    val spine = stages.zipWithIndex
      .map { case ((name, _), i) => (i.toLong, name) }
      .toDF("stage_idx", "stage")
    val w = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    broadcast(spine)
      .join(byFail, col("stage_idx") === col("__ff"), "left")
      .crossJoin(broadcast(total))
      .select(col("stage_idx"), col("stage"),
        coalesce(col("__n"), lit(0L)).as("n_dropped"), col("__total"))
      .withColumn("n_in",
        col("__total") - coalesce(sum(col("n_dropped")).over(w), lit(0L)))
      .withColumn("n_out", col("n_in") - col("n_dropped"))
      .select(
        col("stage_idx"), col("stage"), col("n_in"), col("n_dropped"),
        col("n_out"),
        when(col("n_in") > 0,
          round(col("n_dropped").cast("double") / col("n_in"), 6))
          .as("drop_rate"),
        when(col("__total") > 0,
          round(col("n_out").cast("double") / col("__total"), 6))
          .as("cum_kept_rate"))
  }
}
