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

  /** Largest explicit vocabulary [[trainLinear]] accepts: its
    * per-epoch plan embeds the weights as a `map(...)` literal and
    * the featurizer as an `isin(vocab)` filter — both linear in
    * |vocab| — so past a few thousand terms the generated code, not
    * the data, becomes the cost (the localFrame discipline: fail
    * fast with a named error, point at the scalable path).
    */
  val MaxLinearVocab: Int = 4096

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

  /** A trained hashing-trick model: per-bucket milli-weights (index =
    * bucket) plus the bias, the exact shape [[scoreHashed]]'s runtime
    * path consumes (swap its derived-weight expression for an
    * `element_at` into these).
    */
  final case class TrainedHashedModel(weightsMilli: Seq[Long], biasMilli: Long)

  /** [[scoreHashed]] serving a TRAINED weight array: identical runtime
    * path (hash → bucket → weight lookup → integer accumulate), with
    * the per-bucket weight read from the broadcast literal the trainer
    * produced instead of the derived stand-in.
    */
  def scoreHashedWithWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: TrainedHashedModel,
      seed: String,
      threshold: Double): DataFrame = {
    val buckets = model.weightsMilli.size
    require(buckets > 0, "empty weight array")
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val bucket =
      Sampling.hexPrefixValue(md5(concat(lit(seed), col("term")))) % buckets
    val scored = toks
      .withColumn("__w",
        element_at(typedLit(model.weightsMilli), (bucket + 1).cast("int")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"), sum(col("__w")).as("__raw"))
    finish(docs, scored, idCol, model.biasMilli, threshold)
  }

  /** TRAIN the hashed quality classifier — the "other half" that makes
    * [[scoreLinear]]/[[scoreHashed]] a real CCNet/fastText-style filter
    * stage instead of a scorer waiting for outside weights: full-batch
    * gradient descent on a logistic-like objective over the
    * hashing-trick feature space, as a BOUNDED DRIVER LOOP (the
    * Lloyd/BPE pattern: per-epoch one partial-aggregated gradient job,
    * one `buckets+1`-row collect, a driver weight update).
    *
    * Engine-exact by construction, so a SQL oracle replays the epochs
    * as unrolled CTEs and reproduces every final weight bit-for-bit:
    *
    *  - Features are integer tf counts over `buckets` md5-hash buckets
    *    (the [[scoreHashed]] bucketing); weights are integer
    *    milli-units.
    *  - The margin `z = (bias + Σ tf·w) / (1000·max(dl,1))` divides
    *    exact integers once in double ([[scoreHashed]]'s own
    *    normalization, so trained weights drop straight into it).
    *  - The link is the RATIONAL fast sigmoid
    *    `σ̂(z) = 0.5 + z / (2·(1+|z|))` — same monotone S-shape,
    *    but only correctly-rounded IEEE ops (`exp` differs in the
    *    last ulp across engines and would poison the integer replay).
    *  - The per-document residual `(σ̂−y)/dl` is quantized to exact
    *    micro-units BEFORE summing, so the gradient is an exact
    *    BIGINT sum — no order-dependent float accumulation.
    *  - The update `w ← w − sign(g)·(|g|·lrNum div (n·1000·lrDen))`
    *    is exact integer arithmetic (the kmeans micro-unit
    *    discipline), with the per-sample 1/n average folded in so one
    *    learning rate works across scale factors.
    *
    * Scale shape (round 16 — the q167 driver-bench incident): the
    * corpus featurizes ONCE into a checkpointed one-row-per-document
    * frame `(id, dl, y, sparse bucket-tf list)`, and each epoch is a
    * SINGLE join-free scan of it — the per-doc dot and residual
    * compute inline over the tf list (the weight array rides as a
    * literal), and the gradient is one partial-aggregated shuffle of
    * ≤ `(buckets+1) × partitions` rows straight to a
    * `buckets+1`-row collect. The previous shape ran TWO shuffled
    * joins per epoch (per-doc margins joined back to the feature
    * rows); under a degraded scheduler every extra barrier stretched,
    * and q167 measured 4x its warm level in two consecutive driver
    * artifacts while probes read healthy. Fewer barriers, same exact
    * integers: per-doc dot order is irrelevant (integer adds), the
    * residual/update arithmetic is unchanged term for term, so the
    * trained weights are bit-identical (TrainClassifierSpec pins this
    * against the unrolled-CTE oracle replay).
    */
  def trainHashed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      buckets: Int,
      seed: String,
      epochs: Int,
      lrNum: Long,
      lrDen: Long): TrainedHashedModel = {
    require(buckets > 0, "buckets must be positive")
    require(epochs >= 0, "epochs must be non-negative")
    require(lrNum > 0 && lrDen > 0, "learning rate must be positive")
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val bucket =
      Sampling.hexPrefixValue(md5(concat(lit(seed), col("term")))) % buckets
    val bucketTf = toks.withColumn("__b", bucket)
      .groupBy(col("__id"), col("__b")).agg(count(lit(1)).as("__tf"))
      .groupBy(col("__id"))
      .agg(collect_list(struct(col("__b"), col("__tf"))).as("__f"))
    // one row per document; zero-token docs carry an empty tf list
    val dense = docs.select(col(idCol).as("__id"),
        greatest(TextAnalysis.tokenCount(col(textCol)), lit(1L)).as("__dl"),
        label.cast("long").as("__y"))
      .join(bucketTf, Seq("__id"), "left")
      .withColumn("__f", coalesce(col("__f"), array()))
      .localCheckpoint()
    try {
      val n = dense.count()
      val w = Array.fill(buckets)(0L)
      var b = 0L
      val den = n * 1000L * lrDen
      for (_ <- 1 to epochs) {
        val wArr = typedLit(w.toSeq)
        val dot = aggregate(col("__f"), lit(0L), (acc, s) =>
          acc + s.getField("__tf") *
            element_at(wArr, (s.getField("__b") + 1).cast("int")))
        val z = (lit(b) + dot).cast("double") /
          (lit(1000.0) * col("__dl").cast("double"))
        val grads = dense
          .withColumn("__z", z)
          .withColumn("__s",
            lit(0.5) + col("__z") / (lit(2.0) * (lit(1.0) + abs(col("__z")))))
          .withColumn("__r", round(
            round((col("__s") - col("__y")) / col("__dl").cast("double"), 6)
              * 1e6).cast("long"))
          // per-row gradient rows (bucket, tf·r) plus the bias row
          // (-1, r) — exploded in the SAME scan, so the epoch has no
          // join anywhere; the groupBy partial-aggregates map-side
          .select(explode(concat(
            transform(col("__f"), s => struct(
              s.getField("__b").as("__b"),
              (s.getField("__tf") * col("__r")).as("__g"))),
            array(struct(lit(-1L).as("__b"), col("__r").as("__g"))))).as("__e"))
          .groupBy(col("__e.__b").as("__b"))
          .agg(sum(col("__e.__g")).as("__g"))
          .collect()
        grads.foreach { r =>
          val bk = r.getLong(0)
          val g = r.getLong(1)
          val step = math.abs(g) * lrNum / den
          val delta = if (g > 0) -step else step
          if (bk < 0) b += delta else w(bk.toInt) += delta
        }
      }
      TrainedHashedModel(w.toSeq, b)
    } finally {
      org.apache.spark.sql.graftbridge.unpersistCheckpointed(dense)
    }
  }

  /** [[scoreHashedWithWeights]] with the score surfaced as EXACT
    * integer micro-units instead of a rounded double:
    * `score_micro = round_half_away(10^6 · (bias + Σ tf·w) / (1000·dl))`
    * computed entirely in integer arithmetic (`(|n|·10^6 + d div 2)
    * div d`, sign split out). `round(double, 6)` can land on a decimal
    * half-boundary where two engines' double-rounding differs by one
    * ulp of the last digit (observed once in 500 docs at sf0.01);
    * integer micro-units make the gate's output reproducible
    * bit-for-bit. `keep = score_micro >= thresholdMicro`.
    */
  def scoreHashedWithWeightsMicro(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: TrainedHashedModel,
      seed: String,
      thresholdMicro: Long): DataFrame = {
    val buckets = model.weightsMilli.size
    require(buckets > 0, "empty weight array")
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val bucket =
      Sampling.hexPrefixValue(md5(concat(lit(seed), col("term")))) % buckets
    val scored = toks
      .withColumn("__w",
        element_at(typedLit(model.weightsMilli), (bucket + 1).cast("int")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"), sum(col("__w")).as("__raw"))
    finishMicro(docs, scored, idCol, model.biasMilli, thresholdMicro)
  }

  /** Shared integer micro-unit finish of the `WithWeightsMicro`
    * scorers: `score_micro = round_half_away(10^6·(bias + raw) /
    * (1000·max(dl,1)))` entirely in integer arithmetic.
    */
  private def finishMicro(
      docs: DataFrame,
      scored: DataFrame,
      idCol: String,
      biasMilli: Long,
      thresholdMicro: Long): DataFrame =
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dl"), lit(0L)).as("dl"),
        (lit(biasMilli) + coalesce(col("__raw"), lit(0L))).as("__n"))
      .withColumn("__d",
        lit(1000L) * greatest(col("dl"), lit(1L)))
      .withColumn("score_micro",
        // |__n| can reach ~dl · max|w| milli-units; the ×10^6 step runs
        // in decimal(38,0) so large docs × large trained weights can't
        // silently wrap a Long (the `div` stays an exact integral
        // divide on decimals — same pattern as temperatureMixture's
        // budget allocation in Sampling.scala).
        (when(col("__n") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(cast(abs(__n) as decimal(38,0)) * 1000000 + __d div 2) div __d"))
          .cast("long"))
      .withColumn("keep", col("score_micro") >= thresholdMicro)
      .select(col(idCol), col("dl"), col("score_micro"), col("keep"))

  /** Held-out evaluation report for a trained hashed model — the
    * number a CCNet-style filter decision needs BEFORE gating a
    * corpus: confusion counts and precision/recall/accuracy of
    * `keep = score_micro >= thresholdMicro` against the labels of an
    * EVAL fold the model never trained on. The caller owns the split
    * (pass the held-out frame; the suite splits by the deterministic
    * md5-hash rule it samples with everywhere) so train and eval
    * cannot silently overlap inside this operator.
    *
    * Everything is exact integers: scoring through
    * [[scoreHashedWithWeightsMicro]] (micro-unit scores), counts as
    * BIGINT sums, and the three rates in integer ppm with the
    * zero-denominator cases pinned to 0 (no predicted positives →
    * precision 0; no actual positives → recall 0) — so a DuckDB
    * replay reproduces the report bit-for-bit and two engines can
    * never disagree on a gate decision's quality.
    *
    * Scale shape: ONE pass over the eval fold (the scorer's explode +
    * partial-agged groupBy with the weights riding as a broadcast
    * literal), then a single-row aggregate. Output: `(n_eval, tp, fp,
    * fn, tn, precision_ppm, recall_ppm, accuracy_ppm)`.
    */
  def evaluateHashedMicro(
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      model: TrainedHashedModel,
      seed: String,
      thresholdMicro: Long): DataFrame = {
    val scored = scoreHashedWithWeightsMicro(
      evalDocs, idCol, textCol, model, seed, thresholdMicro)
    val lab = evalDocs.select(col(idCol), label.cast("long").as("__y"))
    scored.join(lab, Seq(idCol))
      .agg(
        count(lit(1)).as("n_eval"),
        sum(when(col("keep") && col("__y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("keep") && col("__y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!col("keep") && col("__y") === 1L, 1L).otherwise(0L)).as("fn"),
        sum(when(!col("keep") && col("__y") === 0L, 1L).otherwise(0L)).as("tn"))
      .select(col("n_eval"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("""CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
                ELSE tp * 1000000 div (tp + fp) END""").as("precision_ppm"),
        expr("""CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
                ELSE tp * 1000000 div (tp + fn) END""").as("recall_ppm"),
        expr("""CASE WHEN n_eval = 0 THEN CAST(0 AS BIGINT)
                ELSE (tp + tn) * 1000000 div n_eval END""").as("accuracy_ppm"))
  }

  /** Gate-THRESHOLD selection on the held-out fold — the step between
    * [[evaluateHashedMicro]] (one threshold's report) and deploying
    * the model into [[DocPipeline.Config]]: sweep `nCandidates + 1`
    * equi-spaced integer thresholds across the eval fold's
    * `score_micro` range and report each gate's exact confusion
    * counts plus precision/recall/F1 in integer ppm, flagging the
    * selected row with `is_best` — so "which threshold do we gate
    * at" is answered by held-out data, not hand-tuning.
    *
    * Everything is exact integers, so a DuckDB replay reproduces the
    * sweep bit-for-bit:
    *
    *  - candidate `i` gates at `t_i = mn + ((mx-mn)·i) div N`
    *    (integral divide; `t_0 = mn` keeps everything, `t_N = mx`
    *    keeps only the top score);
    *  - each score lands in ONE bucket — the largest `i` with
    *    `t_i <= s`, computed by the exact floor-div inversion
    *    `min(N, ((s-mn+1)·N - 1) div (mx-mn))` (all operands
    *    non-negative, so truncating and floor division agree across
    *    engines) — and the per-candidate confusion counts are
    *    DESCENDING cumulative sums over the N+1 buckets, q120's
    *    sweep shape: ONE pass over the eval fold, a bounded-width
    *    groupBy, a window over N+1 rows;
    *  - `f1_ppm = 2·tp·10^6 div (2·tp + fp + fn)` (0 when the
    *    denominator is 0), and `is_best` marks the max-F1 row, ties
    *    broken toward the SMALLEST candidate index — the loosest
    *    gate among F1-equals, i.e. keep the most training data when
    *    the classifier can't tell the difference.
    *
    * Degenerate range (`mx == mn`): every score sits in bucket N and
    * every candidate threshold equals `mn`, so all rows report the
    * keep-everything confusion — the sweep stays well-defined.
    *
    * Output: `(cand, threshold_micro, tp, fp, fn, tn, precision_ppm,
    * recall_ppm, f1_ppm, is_best)`, one row per candidate, ordered
    * by `cand`.
    */
  def gateThresholdSweepMicro(
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      model: TrainedHashedModel,
      seed: String,
      nCandidates: Int = 16): DataFrame = {
    require(nCandidates > 0, "nCandidates must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = evalDocs.sparkSession
    import spark.implicits._
    val N = nCandidates
    val s = scoreHashedWithWeightsMicro(
        evalDocs, idCol, textCol, model, seed, thresholdMicro = 0L)
      .select(col(idCol), col("score_micro"))
      .join(evalDocs.select(col(idCol), label.cast("long").as("__y")), Seq(idCol))
    val mm = s.agg(
      min(col("score_micro")).as("__mn"), max(col("score_micro")).as("__mx"),
      sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("__pt"),
      sum(when(col("__y") === 0L, 1L).otherwise(0L)).as("__nt"))
    val bucketed = s.crossJoin(broadcast(mm))
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(N.toLong))
          .otherwise(least(lit(N.toLong),
            expr(s"((score_micro - __mn + 1) * $N - 1) div (__mx - __mn)"))))
      .groupBy(col("__b"))
      .agg(
        sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y") === 0L, 1L).otherwise(0L)).as("__nn"))
    // N+1 candidate rows carry the window; empty buckets contribute 0
    val cum = Window.orderBy(col("cand").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = (0 to N).map(_.toLong).toDF("cand")
      .crossJoin(broadcast(mm))
      .join(bucketed, col("cand") === col("__b"), "left")
      .withColumn("threshold_micro",
        col("__mn") + expr(s"((__mx - __mn) * cand) div $N"))
      .withColumn("tp", sum(coalesce(col("__np"), lit(0L))).over(cum))
      .withColumn("fp", sum(coalesce(col("__nn"), lit(0L))).over(cum))
      .select(col("cand"), col("threshold_micro"), col("tp"), col("fp"),
        (coalesce(col("__pt"), lit(0L)) - col("tp")).as("fn"),
        (coalesce(col("__nt"), lit(0L)) - col("fp")).as("tn"))
      .withColumn("precision_ppm",
        expr("""CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
                ELSE tp * 1000000 div (tp + fp) END"""))
      .withColumn("recall_ppm",
        expr("""CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
                ELSE tp * 1000000 div (tp + fn) END"""))
      .withColumn("f1_ppm",
        expr("""CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
                ELSE 2 * tp * 1000000 div (2 * tp + fp + fn) END"""))
    val best = Window.orderBy(col("f1_ppm").desc, col("cand").asc)
    swept
      .withColumn("is_best", row_number().over(best) === 1)
      .orderBy("cand")
  }

  /** Calibration (reliability) report of a trained model on the
    * held-out fold: scores bucket into `nBuckets` equi-width integer
    * bins across the fold's range, and each bin reports its exact
    * count, positive count, empirical positive rate in ppm, and mean
    * score in micro-units — the table that says whether "scores 0.8"
    * MEANS 80% positive, the property threshold selection
    * ([[gateThresholdSweepMicro]]) silently leans on. Everything is
    * exact integers (bin by `min(N-1, (s-mn)·N div (mx-mn))`, rate
    * `pos·10^6 div n`, mean `sign·(|Σs| div n)` — sign-split because
    * truncating and floor division disagree on negatives across
    * engines); empty bins emit zero rows, degenerate range
    * (`mx == mn`) collapses to bin 0. One pass over the fold, a
    * bounded-width groupBy — the q120 histogram shape.
    *
    * Output: `(bucket, lo_micro, n, n_pos, pos_rate_ppm,
    * mean_score_micro)`, one row per bin, ordered by bucket.
    */
  def calibrationReportMicro(
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      model: TrainedHashedModel,
      seed: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = evalDocs.sparkSession
    import spark.implicits._
    val n = nBuckets
    val s = scoreHashedWithWeightsMicro(
        evalDocs, idCol, textCol, model, seed, thresholdMicro = 0L)
      .select(col(idCol), col("score_micro"))
      .join(evalDocs.select(col(idCol), label.cast("long").as("__y")), Seq(idCol))
    val mm = s.agg(
      min(col("score_micro")).as("__mn"), max(col("score_micro")).as("__mx"))
    val grouped = s.crossJoin(broadcast(mm))
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(lit((n - 1).toLong),
            expr(s"((score_micro - __mn) * $n) div (__mx - __mn)"))))
      .groupBy(col("__b"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__y")).as("__pos"),
        sum(col("score_micro")).as("__ssum"))
    (0 until n).map(_.toLong).toDF("bucket")
      .crossJoin(broadcast(mm))
      .join(grouped, col("bucket") === col("__b"), "left")
      .select(
        col("bucket"),
        (col("__mn") + expr(s"((__mx - __mn) * bucket) div $n")).as("lo_micro"),
        coalesce(col("__n"), lit(0L)).as("n"),
        coalesce(col("__pos"), lit(0L)).as("n_pos"),
        expr("""CASE WHEN coalesce(__n, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE __pos * 1000000 div __n END""").as("pos_rate_ppm"),
        expr("""CASE WHEN coalesce(__n, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE (CASE WHEN __ssum < 0 THEN -1L ELSE 1L END) *
                     (abs(__ssum) div __n) END""").as("mean_score_micro"))
      .orderBy("bucket")
  }

  /** The selected gate as a VALUE — [[gateThresholdSweepMicro]]'s
    * `is_best` row's threshold, the number [[DocPipeline.Config]]'s
    * model stage consumes. One-row collect of a bounded sweep.
    */
  def selectGateThresholdMicro(
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      model: TrainedHashedModel,
      seed: String,
      nCandidates: Int = 16): Long =
    gateThresholdSweepMicro(
        evalDocs, idCol, textCol, label, model, seed, nCandidates)
      .filter(col("is_best"))
      .select(col("threshold_micro"))
      .collect()(0).getLong(0)

  /** [[scoreHashedWithWeightsMicro]]'s score as a SINGLE per-row
    * expression — the hashed twin of [[scoreExpr]], for FILTER stages
    * ([[DocPipeline.Config.hashedGate]]): `aggregate` over the token
    * array with the trained weights riding as an array-literal LUT,
    * then the exact integer micro finish. Pure codegen — no explode,
    * no shuffle, no join — so the gate rides inside the corpus scan
    * the pipeline already pays, whatever the corpus size. Identical
    * arithmetic to the groupBy scorer bit-for-bit (integer milli
    * accumulation is order-independent; the decimal(38,0)-widened
    * rounding matches `finishMicro` term for term — asserted against
    * the groupBy scorer in TrainClassifierSpec).
    */
  def scoreHashedExprMicro(
      textCol: Column,
      model: TrainedHashedModel,
      seed: String): Column = {
    require(model.weightsMilli.nonEmpty, "empty weight array")
    // one fused codegen node (graft.functions.HashedMicroScore): a
    // higher-order `aggregate` spelling of the same arithmetic runs
    // interpreted (HOFs get no whole-stage codegen) and measured ~3x
    // the codegen'd explode path on the same corpus; the fused kernel
    // tokenizes the UTF8 bytes in place and hashes each token once.
    // Bit-identical to the groupBy scorer (TrainClassifierSpec) and
    // the DuckDB oracle replay (q179).
    graft.functions.HashedMicroScore.scoreMicro(
      textCol, model.weightsMilli, model.biasMilli, seed)
  }

  /** Persist a [[gateThresholdSweepMicro]] result as a STORED selection
    * artifact (a small parquet table, like the IVF index's centroid
    * table): the measured sweep a pipeline config reads its gate from,
    * so batch AND streaming curation gate at a MEASURED threshold
    * rather than a hand-set literal — and re-measuring (overwriting
    * the artifact) re-gates every consumer with no code change.
    */
  def writeGateSelection(sweep: DataFrame, path: String): Unit =
    sweep.coalesce(1).write.mode("overwrite").parquet(path)

  /** Persist a trained hashed model as a STORED artifact — q162's
    * report shape exactly (`(bucket, weight_milli)`, bias at bucket
    * −1), so the table a pipeline run publishes IS the table a deploy
    * reads back. A production gate consumes two stored tables (model +
    * sweep) and retrains nothing.
    */
  def writeHashedModel(
      spark: SparkSession, model: TrainedHashedModel, path: String): Unit = {
    import spark.implicits._
    ((-1L, model.biasMilli) +: model.weightsMilli.zipWithIndex.map {
        case (w, b) => (b.toLong, w)
      })
      .toDF("bucket", "weight_milli")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read back a [[writeHashedModel]] artifact. Fails with a named
    * error on a gapped bucket range (a partial write would otherwise
    * silently shift every weight one bucket left).
    */
  def readHashedModel(spark: SparkSession, path: String): TrainedHashedModel = {
    val rows = spark.read.parquet(path)
      .select(col("bucket"), col("weight_milli"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val buckets = rows.size - 1
    require(rows.contains(-1L), s"model artifact at $path has no bias row")
    require((0L until buckets.toLong).forall(rows.contains),
      s"model artifact at $path has a gapped bucket range (${rows.size} rows)")
    TrainedHashedModel((0 until buckets).map(b => rows(b.toLong)), rows(-1L))
  }

  /** The selected gate read from a stored sweep artifact. The selection
    * RULE (max F1, ties to the smallest candidate = the loosest gate)
    * is RE-DERIVED from the stored rows rather than trusting a stored
    * flag, so the artifact stays a measurement, not a frozen decision:
    * edit the sweep rows and the selection follows. One ≤(N+1)-row
    * collect of an artifact-sized table.
    */
  def readSelectedGateMicro(spark: SparkSession, path: String): Long = {
    val rows = spark.read.parquet(path)
      .orderBy(col("f1_ppm").desc, col("cand").asc)
      .select(col("threshold_micro"))
      .limit(1).collect()
    require(rows.nonEmpty, s"empty gate-selection artifact at $path")
    rows(0).getLong(0)
  }

  /** A trained EXPLICIT-VOCABULARY linear model: term → milli-weight
    * pairs in vocabulary order plus the bias — exactly the shape
    * [[scoreLinear]]/[[scoreExpr]] consume, so training round-trips
    * straight into the serving path with no conversion.
    */
  final case class TrainedLinearModel(
      weightsMilli: Seq[(String, Long)], biasMilli: Long)

  /** TRAIN the explicit-vocabulary linear classifier — [[trainHashed]]
    * with the hashing-trick feature space replaced by a fixed term
    * vocabulary (the fastText-style setup where the feature set is a
    * curated word list, not a hash range). Identical exact-replay
    * integer GD: same rational sigmoid, same micro-unit residual
    * quantization, same integer update rule — so the SQL oracle
    * ([[trainLinearSql]]) replays every epoch and reproduces each
    * final weight bit-for-bit.
    *
    * Featurization differences, and nothing else:
    *  - features are integer tf counts of the VOCAB terms only (the
    *    corpus tokenizes once; out-of-vocabulary tokens contribute no
    *    feature but still count toward `dl`, matching
    *    [[scoreLinear]]'s normalization);
    *  - weights live per term; the per-epoch dot reads them through a
    *    broadcast map literal (bounded by the same
    *    vocabulary-fits-an-expression rule as [[scoreExpr]] — a
    *    multi-million-term model trains through [[trainHashed]]);
    *  - the bias gradient rides the per-term gradient aggregation
    *    under the EMPTY-STRING sentinel term ('' can never be a
    *    corpus token: the tokenizer drops empty splits).
    *
    * Scale shape is [[trainHashed]]'s: one checkpointed
    * `(id, term, tf)` featurization, two partial-aggregated shuffles
    * per epoch, `|vocab|+1` longs to the driver per epoch.
    */
  def trainLinear(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      vocab: Seq[String],
      epochs: Int,
      lrNum: Long,
      lrDen: Long): TrainedLinearModel = {
    require(vocab.nonEmpty, "empty vocabulary")
    // the per-epoch plan carries the weights as a rebuilt map(...)
    // literal and the featurize filter as isin(vocab) — both linear in
    // |vocab|, bounded by the same vocabulary-fits-an-expression rule
    // as scoreExpr. Fail with a named error BEFORE Janino chokes on a
    // megabyte of generated code; big models belong to trainHashed,
    // whose plan is constant-size in the bucket count.
    require(vocab.size <= MaxLinearVocab,
      s"trainLinear vocabulary has ${vocab.size} terms, above the " +
        s"$MaxLinearVocab expression-plan cap — train large models with " +
        "trainHashed (hashing-trick feature space, constant plan size)")
    require(vocab.distinct.size == vocab.size, "duplicate vocabulary terms")
    require(!vocab.contains(""), "empty-string term collides with the bias sentinel")
    require(epochs >= 0, "epochs must be non-negative")
    require(lrNum > 0 && lrDen > 0, "learning rate must be positive")
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val feat = toks.filter(col("term").isin(vocab: _*))
      .groupBy(col("__id"), col("term")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint()
    val meta = docs.select(col(idCol).as("__id"),
        greatest(TextAnalysis.tokenCount(col(textCol)), lit(1L)).as("__dl"),
        label.cast("long").as("__y"))
      .localCheckpoint()
    try {
      val n = meta.count()
      val w = scala.collection.mutable.LinkedHashMap(vocab.map(_ -> 0L): _*)
      var b = 0L
      val den = n * 1000L * lrDen
      for (_ <- 1 to epochs) {
        val wMap = map(vocab.flatMap(t => Seq(lit(t), lit(w(t)))): _*)
        val dots = feat.groupBy(col("__id"))
          .agg(sum(col("__tf") * element_at(wMap, col("term"))).as("__dot"))
        val z = (lit(b) + coalesce(col("__dot"), lit(0L))).cast("double") /
          (lit(1000.0) * col("__dl").cast("double"))
        val resid = meta.join(dots, Seq("__id"), "left")
          .withColumn("__z", z)
          .withColumn("__s",
            lit(0.5) + col("__z") / (lit(2.0) * (lit(1.0) + abs(col("__z")))))
          .withColumn("__r", round(
            round((col("__s") - col("__y")) / col("__dl").cast("double"), 6)
              * 1e6).cast("long"))
          .select(col("__id"), col("__r"))
        val grads = feat.join(resid, "__id")
          .select(col("term"), (col("__tf") * col("__r")).as("__g"))
          .unionByName(resid.select(lit("").as("term"), col("__r").as("__g")))
          .groupBy(col("term")).agg(sum(col("__g")).as("__g"))
          .collect()
        grads.foreach { r =>
          val t = r.getString(0)
          val g = r.getLong(1)
          val step = math.abs(g) * lrNum / den
          val delta = if (g > 0) -step else step
          if (t.isEmpty) b += delta else w(t) += delta
        }
      }
      TrainedLinearModel(w.toSeq, b)
    } finally {
      org.apache.spark.sql.graftbridge.unpersistCheckpointed(feat)
      org.apache.spark.sql.graftbridge.unpersistCheckpointed(meta)
    }
  }

  /** [[scoreLinear]] serving a TRAINED model with the score surfaced
    * as EXACT integer micro-units — the explicit-vocabulary twin of
    * [[scoreHashedWithWeightsMicro]] (same rationale: `round(double,
    * 6)` can land on a half-boundary where two engines' rounding
    * differs by one ulp; integer micro-units are bit-reproducible).
    * `keep = score_micro >= thresholdMicro`.
    */
  def scoreLinearMicro(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: TrainedLinearModel,
      thresholdMicro: Long): DataFrame = {
    require(model.weightsMilli.nonEmpty, "empty weight vocabulary")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = broadcast(model.weightsMilli.toDF("term", "__w"))
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // left join: OOV terms contribute weight 0 but still count toward dl
    val scored = toks.join(w, Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"),
        sum(coalesce(col("__w"), lit(0L))).as("__raw"))
    finishMicro(docs, scored, idCol, model.biasMilli, thresholdMicro)
  }

  /** The epoch-unrolled ANSI-SQL twin of [[trainLinear]] (DuckDB
    * dialect), SELECTing `(term, weight_milli)` — bias at the empty
    * string. Mirrors [[trainHashedSql]]'s structure term-for-bucket.
    */
  def trainLinearSql(
      table: String,
      labelTokenSql: String,
      vocab: Seq[String],
      epochs: Int,
      lrNum: Long,
      lrDen: Long): String =
    s"""WITH ${trainLinearCtes(table, labelTokenSql, vocab, epochs, lrNum, lrDen)}
       |SELECT term, CAST(wm AS BIGINT) AS weight_milli
       |FROM w$epochs ORDER BY term""".stripMargin

  /** The CTE chain of [[trainLinearSql]] WITHOUT the final SELECT, so
    * composed oracles (train-then-score) can read the trained
    * `w<epochs>` table and the `toks`/`feat` frames it already built.
    *
    * Every CTE is emitted `AS MATERIALIZED`: DuckDB inlines plain CTEs
    * per reference, so the epoch chain (each `w\$k` referenced three
    * times by epoch k+1, `feat`/`meta` by every epoch) otherwise
    * re-evaluates the whole training replay exponentially — the
    * round-13 oracle suite spent 94% of its ~950 s wall in exactly
    * this (q175/q176/q178 at 519/184/185 s; materialized: <1 s each).
    */
  def trainLinearCtes(
      table: String,
      labelTokenSql: String,
      vocab: Seq[String],
      epochs: Int,
      lrNum: Long,
      lrDen: Long): String = {
    val toksList = TextAnalysis.tokensSql("text")
    val vocabVals = vocab.map(t => s"('${t.replace("'", "''")}')").mkString(", ")
    val base =
      s"""vocab(term) AS MATERIALIZED (VALUES $vocabVals),
         |toks AS MATERIALIZED (SELECT doc_id, unnest($toksList) AS term FROM $table),
         |feat AS MATERIALIZED (SELECT t.doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
         |         FROM toks t JOIN vocab v ON v.term = t.term GROUP BY 1, 2),
         |meta AS MATERIALIZED (SELECT doc_id,
         |           greatest(CAST(len($toksList) AS BIGINT), 1) AS dl,
         |           CAST(list_contains($toksList, '$labelTokenSql') AS BIGINT) AS y
         |         FROM $table),
         |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM $table),
         |w0 AS MATERIALIZED (SELECT term, CAST(0 AS BIGINT) AS wm FROM vocab
         |       UNION ALL SELECT '', CAST(0 AS BIGINT))""".stripMargin
    val epochCtes = (1 to epochs).map { k =>
      val p = k - 1
      s"""d$k AS MATERIALIZED (SELECT f.doc_id, SUM(f.tf * w.wm) AS dot
         |        FROM feat f JOIN w$p w ON w.term = f.term GROUP BY 1),
         |r$k AS MATERIALIZED (SELECT doc_id, CAST(round(round(
         |          ((0.5 + z / (2.0 * (1.0 + abs(z)))) - y) / dl, 6) * 1e6)
         |          AS BIGINT) AS r
         |        FROM (SELECT m.doc_id, m.y, CAST(m.dl AS DOUBLE) AS dl,
         |               CAST((SELECT wm FROM w$p WHERE term = '')
         |                    + COALESCE(d.dot, 0) AS DOUBLE)
         |                 / (1000.0 * m.dl) AS z
         |              FROM meta m LEFT JOIN d$k d ON d.doc_id = m.doc_id)),
         |g$k AS MATERIALIZED (SELECT term, SUM(g) AS g FROM (
         |          SELECT f.term, f.tf * r.r AS g
         |          FROM feat f JOIN r$k r ON r.doc_id = f.doc_id
         |          UNION ALL SELECT '' AS term, r AS g FROM r$k)
         |        GROUP BY 1),
         |w$k AS MATERIALIZED (SELECT w.term, w.wm - CASE
         |          WHEN COALESCE(g.g, 0) > 0
         |            THEN (abs(g.g) * $lrNum) // (nn.n * 1000 * $lrDen)
         |          WHEN COALESCE(g.g, 0) < 0
         |            THEN -((abs(g.g) * $lrNum) // (nn.n * 1000 * $lrDen))
         |          ELSE 0 END AS wm
         |        FROM w$p w LEFT JOIN g$k g ON g.term = w.term CROSS JOIN nn)""".stripMargin
    }
    s"""$base,
       |${epochCtes.mkString(",\n")}""".stripMargin
  }

  /** The epoch-unrolled ANSI-SQL twin of [[trainHashed]] (DuckDB
    * dialect), SELECTing `(bucket, weight_milli)` — bias at bucket −1.
    * Every CTE mirrors one step of the Spark loop; generating it here
    * keeps the two replicas of the algorithm in one file.
    */
  def trainHashedSql(
      table: String,
      labelTokenSql: String,
      buckets: Int,
      seed: String,
      epochs: Int,
      lrNum: Long,
      lrDen: Long): String =
    s"""WITH ${trainHashedCtes(table, labelTokenSql, buckets, seed, epochs, lrNum, lrDen)}
       |SELECT b AS bucket, CAST(wm AS BIGINT) AS weight_milli
       |FROM w$epochs ORDER BY bucket""".stripMargin

  /** The CTE chain of [[trainHashedSql]] WITHOUT the final SELECT, so
    * composed oracles (train-then-gate) can read the trained `w<epochs>`
    * table and the `toks`/`feat` frames it already built.
    *
    * Every CTE is `AS MATERIALIZED` — see [[trainLinearCtes]] for the
    * DuckDB re-inlining rationale (the round-13 oracle-cost incident).
    */
  def trainHashedCtes(
      table: String,
      labelTokenSql: String,
      buckets: Int,
      seed: String,
      epochs: Int,
      lrNum: Long,
      lrDen: Long): String = {
    val toksList = TextAnalysis.tokensSql("text")
    val hex = Sampling.hexPrefixSql(s"md5('$seed' || term)")
    val base =
      s"""toks AS MATERIALIZED (SELECT doc_id, unnest($toksList) AS term FROM $table),
         |feat AS MATERIALIZED (SELECT doc_id, CAST(($hex) % $buckets AS BIGINT) AS b,
         |           CAST(count(*) AS BIGINT) AS tf
         |         FROM toks GROUP BY 1, 2),
         |meta AS MATERIALIZED (SELECT doc_id,
         |           greatest(CAST(len($toksList) AS BIGINT), 1) AS dl,
         |           CAST(list_contains($toksList, '$labelTokenSql') AS BIGINT) AS y
         |         FROM $table),
         |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM $table),
         |w0 AS MATERIALIZED (SELECT CAST(range AS BIGINT) - 1 AS b, CAST(0 AS BIGINT) AS wm
         |       FROM range(0, ${buckets + 1}))""".stripMargin
    val epochCtes = (1 to epochs).map { k =>
      val p = k - 1
      s"""d$k AS MATERIALIZED (SELECT f.doc_id, SUM(f.tf * w.wm) AS dot
         |        FROM feat f JOIN w$p w ON w.b = f.b GROUP BY 1),
         |r$k AS MATERIALIZED (SELECT doc_id, CAST(round(round(
         |          ((0.5 + z / (2.0 * (1.0 + abs(z)))) - y) / dl, 6) * 1e6)
         |          AS BIGINT) AS r
         |        FROM (SELECT m.doc_id, m.y, CAST(m.dl AS DOUBLE) AS dl,
         |               CAST((SELECT wm FROM w$p WHERE b = -1)
         |                    + COALESCE(d.dot, 0) AS DOUBLE)
         |                 / (1000.0 * m.dl) AS z
         |              FROM meta m LEFT JOIN d$k d ON d.doc_id = m.doc_id)),
         |g$k AS MATERIALIZED (SELECT b, SUM(g) AS g FROM (
         |          SELECT f.b, f.tf * r.r AS g
         |          FROM feat f JOIN r$k r ON r.doc_id = f.doc_id
         |          UNION ALL SELECT CAST(-1 AS BIGINT) AS b, r AS g FROM r$k)
         |        GROUP BY 1),
         |w$k AS MATERIALIZED (SELECT w.b, w.wm - CASE
         |          WHEN COALESCE(g.g, 0) > 0
         |            THEN (abs(g.g) * $lrNum) // (nn.n * 1000 * $lrDen)
         |          WHEN COALESCE(g.g, 0) < 0
         |            THEN -((abs(g.g) * $lrNum) // (nn.n * 1000 * $lrDen))
         |          ELSE 0 END AS wm
         |        FROM w$p w LEFT JOIN g$k g ON g.b = w.b CROSS JOIN nn)""".stripMargin
    }
    s"""$base,
       |${epochCtes.mkString(",\n")}""".stripMargin
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
