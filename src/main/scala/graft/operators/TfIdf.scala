package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus.
  *
  * Shape: one explode to (doc, term) rows, one groupBy for term
  * frequencies, one groupBy for document frequencies, a 1-row corpus
  * count joined in (broadcast — it is a scalar), and a per-doc window
  * for top-k. Every aggregation is partial-aggregated map-side; the
  * heavy shuffles key on (doc, term) and (term), both high-cardinality
  * and skew-resistant.
  *
  * idf uses the smoothed form `ln((N + 1) / (df + 1)) + 1`
  * (sklearn's `TfidfTransformer(smooth_idf=True)`): never division by
  * zero, never a negative weight.
  */
object TfIdf {

  /** Top-`k` TF-IDF terms per document: (id, rank, term, tf, score).
    * Ties break lexicographically on the term for determinism.
    */
  def topTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("__n"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (log((col("__n") + 1).cast("double") / (col("df") + 1)) + 1))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("score"))
  }
}
