package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline metrics via `Dataset.observe`: the
  * aggregates ride along with whatever action the caller runs — no
  * second scan, no accumulator plumbing. This is how a production
  * cleaning job reports docs-in/docs-out/token counts without paying
  * for a monitoring query at 100 TB.
  */
object Metrics {

  /** Attach corpus quality metrics to `df`; read them from the
    * returned [[Observation]] AFTER an action on the returned frame:
    * `n_docs`, `n_tokens`, `min_tokens`, `max_tokens`, `n_empty`.
    *
    * NULL text counts as zero tokens — a junk counter that skipped
    * null documents would report a 30%-null corpus as clean — and
    * every metric is null-safe so an all-empty batch yields 0s, not
    * NULLs that NPE a dashboard's arithmetic.
    */
  def observeCorpus(df: DataFrame, textCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val n = coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L))
    val observed = df.observe(obs,
      count(lit(1)).as("n_docs"),
      coalesce(sum(n), lit(0L)).as("n_tokens"),
      coalesce(min(n), lit(0L)).as("min_tokens"),
      coalesce(max(n), lit(0L)).as("max_tokens"),
      count(when(n === 0, 1)).as("n_empty"))
    (observed, obs)
  }

  /** Classifier threshold sweep: precision/recall of "select rows with
    * score >= t" at `buckets` equi-width thresholds over the observed
    * score range — how a quality-filter cut-off is calibrated before
    * committing a corpus selection (CCNet/fastText-style filters ship
    * with exactly such a sweep behind their chosen threshold).
    *
    * One distributed pass builds the per-bucket (positives, negatives)
    * table; the sweep itself is a cumulative window over at most
    * `buckets` rows DESCENDING (selecting at threshold t keeps every
    * bucket above t), so the single-partition window is O(buckets) —
    * constant — regardless of corpus size. Score min/max arrive via a
    * broadcast one-row aggregate, as does the positive total for
    * recall. Rows with the top score land in the last bucket (the
    * `least` clamp); a constant score column degenerates to bucket 0.
    *
    * Output per non-empty bucket: `bucket`, `threshold` (the bucket's
    * lower score bound), `tp`/`fp`/`fn` for selection at that
    * threshold, and rounded `precision`/`recall`.
    */
  def thresholdSweep(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      buckets: Int = 20): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val s = df.select(
      col(scoreCol).cast("double").as("__sc"),
      col(labelCol).cast("boolean").as("__lab"))
    val mm = s.agg(min(col("__sc")).as("__mn"), max(col("__sc")).as("__mx"))
    val g = s.crossJoin(broadcast(mm))
      .withColumn("__bkt",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col("__sc") - col("__mn")) /
              ((col("__mx") - col("__mn")) / buckets)),
            lit(buckets - 1L))))
      .groupBy(col("__bkt"))
      .agg(
        sum(when(col("__lab"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__lab"), 0L).otherwise(1L)).as("__nn"),
        min(col("__mn")).as("__mn"), min(col("__mx")).as("__mx"))
    val tot = g.agg(sum(col("__np")).as("__pos_total"))
    val w = Window.orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.crossJoin(broadcast(tot))
      .withColumn("tp", sum(col("__np")).over(w))
      .withColumn("fp", sum(col("__nn")).over(w))
      .select(
        col("__bkt").as("bucket"),
        round(col("__mn") + col("__bkt") *
          ((col("__mx") - col("__mn")) / buckets), 6).as("threshold"),
        col("tp"), col("fp"),
        (col("__pos_total") - col("tp")).as("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6).as("precision"),
        when(col("__pos_total") > 0,
          round(col("tp").cast("double") / col("__pos_total"), 6)).as("recall"))
      .orderBy(col("bucket"))
  }
}
