package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: score every document with a linear
  * text classifier and keep those above a threshold — the
  * "fastText-quality-classifier" stage every large pretraining
  * pipeline runs after heuristic cleaning (CCNet, DCLM, FineWeb all
  * gate on a cheap linear model's score).
  *
  * The reference engine has no model surface; this is the Spark-side
  * plumbing for one, designed so a real trained model drops in as
  * data, not code:
  *
  *  - [[scoreLinear]] applies EXPLICIT per-term weights (the learned
  *    vocabulary of a trained linear model, loaded as a table). The
  *    weight table broadcast-joins against the corpus tokens — the
  *    corpus never shuffles; scoring is one explode + one
  *    partial-aggregated groupBy per document.
  *  - [[scoreHashed]] is the hashing-trick variant (Weinberger et al.,
  *    ICML'09): out-of-vocabulary-free, fixed memory, the form a
  *    multi-million-feature model ships in. Bucket weights here are
  *    derived deterministically from the bucket hash itself (this
  *    container trains no model), exercising the exact runtime path —
  *    hash → bucket → weight lookup → integer accumulate — that a
  *    learned weight array would use.
  *
  * Determinism: weights are integer MILLI-units; per-document scores
  * accumulate as exact BIGINT sums (never floating sums, whose partial
  * order is engine-dependent); the only double op is the final
  * length-normalized division, identical under IEEE in Spark and the
  * DuckDB oracle.
  */
object QualityClassifier {

  /** A linear model as DATA: term → milli-weight vocabulary, bias,
    * and the keep threshold on the length-normalized score.
    */
  final case class LinearModel(
      weightsMilli: Seq[(String, Long)],
      biasMilli: Long,
      threshold: Double)

  /** [[scoreLinear]]'s score as a SINGLE per-row expression: a map
    * literal + `aggregate` over the token array — pure codegen, no
    * explode, no shuffle, no join. This is the form a FILTER stage
    * wants (see [[DocPipeline]]'s model gate): it rides inside the
    * corpus scan that the pipeline already pays, whereas the
    * [[scoreLinear]] shape (explode → groupBy → join back) exists for
    * the standalone scoring query that must RETURN dl and score per
    * document. Identical arithmetic: integer milli accumulation in
    * token order, one final rounded division.
    *
    * The map literal bounds this to vocabularies that fit a codegen'd
    * expression (thousands of terms). A multi-million-term model uses
    * [[scoreHashed]]'s bucket form instead — the lookup becomes
    * arithmetic on the hash, with no literal at all.
    */
  def scoreExpr(textCol: Column, model: LinearModel): Column = {
    require(model.weightsMilli.nonEmpty, "empty weight vocabulary")
    val m = map(model.weightsMilli.flatMap {
      case (t, w) => Seq(lit(t), lit(w))
    }: _*)
    val toks = TextAnalysis.tokens(textCol)
    val raw = aggregate(toks, lit(model.biasMilli),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0L)))
    round(raw.cast("double") /
      (lit(1000.0) * greatest(size(toks).cast("long"), lit(1L))), 6)
  }

  /** Score = `(bias + Σ_t tf(t)·w(t)) / (1000 · max(dl, 1))` with
    * explicit milli-unit weights: `(id, dl, score, keep)`, one row per
    * input document (zero-token docs score `bias/1000`).
    *
    * Length normalization keeps the threshold meaningful across doc
    * sizes (a raw sum just measures length); `keep = score >= threshold`.
    */
  def scoreLinear(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weightsMilli: Seq[(String, Long)],
      biasMilli: Long,
      threshold: Double): DataFrame = {
    require(weightsMilli.nonEmpty, "empty weight vocabulary")
    require(weightsMilli.map(_._1).distinct.size == weightsMilli.size,
      "duplicate terms in weight vocabulary")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(weightsMilli.toDF("term", "__w"))
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // left join: OOV terms contribute weight 0 but still count toward dl
    val scored = toks.join(w, Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"),
        sum(coalesce(col("__w"), lit(0L))).as("__raw"))
    finish(docs, scored, idCol, biasMilli, threshold)
  }

  /** Hashing-trick scoring over `buckets` features:
    * `bucket(t) = hexPrefix(md5(seed || t)) % buckets`,
    * `w(bucket) = (bucket % 2001) − 1000` milli-units (deterministic
    * stand-in for a learned weight array — swap this one expression
    * for a broadcast array lookup to serve a real model).
    */
  def scoreHashed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int,
      seed: String,
      biasMilli: Long,
      threshold: Double): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val bucket = Sampling.hexPrefixValue(md5(concat(lit(seed), col("term")))) % buckets
    val scored = toks
      .withColumn("__w", (bucket % 2001) - 1000)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"), sum(col("__w")).as("__raw"))
    finish(docs, scored, idCol, biasMilli, threshold)
  }

  /** ANSI-SQL twin of [[scoreHashed]]'s per-term weight over a term
    * expression, for oracle queries.
    */
  def hashedWeightSql(termExpr: String, buckets: Int, seed: String): String = {
    val hp = Sampling.hexPrefixSql(s"md5('$seed' || $termExpr)")
    s"((($hp) % $buckets) % 2001) - 1000"
  }

  private def finish(
      docs: DataFrame,
      scored: DataFrame,
      idCol: String,
      biasMilli: Long,
      threshold: Double): DataFrame =
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dl"), lit(0L)).as("dl"),
        round((lit(biasMilli) + coalesce(col("__raw"), lit(0L))).cast("double") /
          (lit(1000.0) * greatest(coalesce(col("dl"), lit(0L)), lit(1L)).cast("double")), 6)
          .as("score"))
      .withColumn("keep", col("score") >= threshold)
}
