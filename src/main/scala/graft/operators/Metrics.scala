package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
}
