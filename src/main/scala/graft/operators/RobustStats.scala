package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust / distributional statistics: MAD outlier detection,
  * equi-width histograms, and exact-cutpoint equi-depth bucketing.
  *
  * The reference has no statistics surface (SURVEY.md §2.5 marks
  * general aggregation *absent*); these are the data-profiling
  * extensions a 100 TB pipeline needs. All shapes are two-pass
  * group-aggregates: the per-group medians/cutpoints reduce to a few
  * rows which re-enter the plan via `broadcast` joins — never a
  * driver-side collect, never a global sort.
  *
  * Determinism: `percentile_disc` picks an actual data value (exact in
  * both Spark and DuckDB — see q35/q67), so downstream arithmetic runs
  * on identical doubles in both engines.
  *
  * Cardinality contract: the grouped operators broadcast their
  * per-group stats frame back onto the data, which assumes `groupCol`
  * is dimension-like (event types, priorities — thousands, not
  * billions). For high-cardinality groups remove the hint and let the
  * shuffled equi-join / AQE handle it. `percentile_disc` also buffers
  * each GROUP's values in one aggregate buffer, which caps per-group
  * row counts at executor memory — [[discCutpoints]] is the unbounded
  * alternative for the global case.
  */
object RobustStats {

  /** Per-group MAD (median absolute deviation) outlier report:
    * (group, n, med, mad, n_outliers) where an outlier deviates from
    * the group median by more than `cutoff * 1.4826 * mad` (1.4826
    * scales MAD to the stddev of a normal distribution).
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      cutoff: Double = 3.0): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val med = df.groupBy(g)
      .agg(expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valueCol)").as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("__dev", abs(v - col("med")))
    val mad = dev.groupBy(g)
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __dev)").as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(g)
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(cutoff) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(g)
  }

  /** DuckDB SQL equivalent of [[madOutliers]]. */
  def madOutliersSql(src: String, groupCol: String, valueCol: String,
      cutoff: Double = 3.0): String =
    s"""WITH med AS (
       |  SELECT $groupCol, quantile_disc($valueCol, 0.5) AS med
       |  FROM $src GROUP BY 1),
       |dev AS (SELECT t.$groupCol, abs(t.$valueCol - med.med) AS dev, med.med
       |        FROM $src t JOIN med USING ($groupCol)),
       |mad AS (SELECT $groupCol, quantile_disc(dev, 0.5) AS mad FROM dev GROUP BY 1)
       |SELECT dev.$groupCol, COUNT(*) AS n, ANY_VALUE(dev.med) AS med,
       |  ANY_VALUE(mad.mad) AS mad,
       |  CAST(SUM(CASE WHEN dev.dev > $cutoff * 1.4826 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM dev JOIN mad USING ($groupCol)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Equi-width histogram of `valueCol` with `nBuckets` buckets of
    * `width` starting at `lo`; values outside clamp to the edge
    * buckets. One partial-aggregated groupBy — the classic single-pass
    * distributed histogram.
    */
  def equiWidthHistogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      width: Double,
      nBuckets: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val bucket = least(greatest(floor((v - lo) / width), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("long")
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(v).as("lo_v"),
        max(v).as("hi_v"))
      .orderBy("bucket")
  }

  /** DuckDB SQL equivalent of [[equiWidthHistogram]]. */
  def equiWidthHistogramSql(src: String, valueCol: String,
      lo: Double, width: Double, nBuckets: Int): String =
    s"""SELECT CAST(least(greatest(floor((CAST($valueCol AS DOUBLE) - $lo) / $width), 0.0),
       |    ${nBuckets - 1}.0) AS BIGINT) AS bucket,
       |  COUNT(*) AS n,
       |  min(CAST($valueCol AS DOUBLE)) AS lo_v,
       |  max(CAST($valueCol AS DOUBLE)) AS hi_v
       |FROM $src GROUP BY 1 ORDER BY 1""".stripMargin

  /** Empirical CDF of `valueCol` as a (v, cum, pct) table over the
    * DISTINCT values: pct = fraction of rows with value <= v — the
    * quantile-rank (percentile) feature transform. Equivalent to
    * `cume_dist() OVER (ORDER BY v)`, but that window is a
    * single-partition global sort; this is a value-grouped count +
    * one distributed prefix sum, the same machinery as
    * [[discCutpoints]]. Join it back on the value column (or
    * range-join for unseen values) to annotate rows.
    */
  def empiricalCdf(df: DataFrame, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("__c"))
    val cum = PrefixSum.runningSum(counts, Seq(col("v")), "__c", "cum")
    val tot = counts.agg(sum(col("__c")).as("__n"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("cum"),
        round(col("cum").cast("double") / col("__n"), 9).as("pct"))
  }

  /** DuckDB SQL equivalent of [[empiricalCdf]] (via `cume_dist`).
    * Windows ORDER BY the DOUBLE cast — the Spark side groups by the
    * cast, so ordering the raw column would diverge on sources whose
    * raw ordering differs from (or collides under) the cast.
    */
  def empiricalCdfSql(src: String, valueCol: String): String =
    s"""SELECT DISTINCT CAST($valueCol AS DOUBLE) AS v,
       |  CAST(COUNT(*) OVER (ORDER BY CAST($valueCol AS DOUBLE) RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |  round(cume_dist() OVER (ORDER BY CAST($valueCol AS DOUBLE)), 9) AS pct
       |FROM $src WHERE $valueCol IS NOT NULL""".stripMargin

  /** Winsorized per-group means: clip `valueCol` to its group's
    * [pLo, pHi] exact disc percentiles, then report raw vs clipped
    * means. The cutpoints are actual 2-decimal data values, so the
    * clipped sum stays exact in DECIMAL(18,2) and the final division
    * is one double op — hash-stable across engines.
    */
  def winsorizedMeans(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double,
      pHi: Double): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val cuts = df.groupBy(g).agg(
      expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY $valueCol)").as("c_lo"),
      expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY $valueCol)").as("c_hi"))
    val dec = (c: Column) => c.cast("decimal(18,2)")
    df.join(broadcast(cuts), groupCol)
      .withColumn("__w", least(greatest(v, col("c_lo")), col("c_hi")))
      .groupBy(g)
      .agg(
        count(lit(1)).as("n"),
        sum(dec(v)).as("__sv"),
        sum(dec(col("__w"))).as("__sw"))
      .select(g, col("n"),
        round(col("__sv").cast("double") / col("n"), 6).as("mean_raw"),
        round(col("__sw").cast("double") / col("n"), 6).as("mean_winsor"))
      .orderBy(g)
  }

  /** DuckDB SQL equivalent of [[winsorizedMeans]]. */
  def winsorizedMeansSql(src: String, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): String =
    s"""WITH cuts AS (
       |  SELECT $groupCol,
       |    quantile_disc($valueCol, $pLo) AS c_lo,
       |    quantile_disc($valueCol, $pHi) AS c_hi
       |  FROM $src GROUP BY 1),
       |w AS (SELECT t.$groupCol, t.$valueCol AS v,
       |        least(greatest(t.$valueCol, cuts.c_lo), cuts.c_hi) AS wv
       |      FROM $src t JOIN cuts USING ($groupCol))
       |SELECT $groupCol, COUNT(*) AS n,
       |  round(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
       |  round(CAST(SUM(CAST(wv AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS mean_winsor
       |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact discrete quantile cutpoints at fractions `numerators(i) /
    * denom`, as ONE single-row frame with columns `__c0..__c{m-1}`.
    *
    * `percentile_disc` is a buffering TypedImperativeAggregate — each
    * instance holds (and sorts) every value, so m cutpoints cost m
    * full sorts of the table. This computes all of them in one
    * distributed pass instead: group by value (one partial-aggregated
    * shuffle to ~distinct-values rows), distributed prefix sum of the
    * counts in value order ([[PrefixSum]] — no single-partition sort),
    * then pick each fraction's boundary row with exact integer
    * arithmetic: the smallest value whose cumulative count reaches
    * `ceil(n * num / denom)` (the SQL `percentile_disc` definition),
    * tested as `cum * denom >= num * n` so no float rank ever rounds.
    */
  def discCutpoints(
      df: DataFrame,
      valueCol: String,
      numerators: Seq[Int],
      denom: Int): DataFrame = {
    require(numerators.forall(i => i > 0 && i < denom), "fractions must be in (0,1)")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = PrefixSum.runningSum(counts, Seq(col("__v")), "__c", "__cum")
    val tot = counts.agg(sum(col("__c")).as("__n"))
    val picks = numerators.zipWithIndex.map { case (num, i) =>
      max(when(
        col("__cum") * denom >= lit(num.toLong) * col("__n") &&
          (col("__cum") - col("__c")) * denom < lit(num.toLong) * col("__n"),
        col("__v"))).as(s"__c$i")
    }
    cum.crossJoin(broadcast(tot)).agg(picks.head, picks.tail: _*)
  }

  /** Equi-depth bucketing via exact disc cutpoints ([[discCutpoints]]):
    * assigns each row the count of cutpoints strictly below its value
    * (so ties always land in one bucket, unlike `ntile`, which splits
    * them arbitrarily — and unlike `ntile` this needs no single-
    * partition global sort, only aggregates + a broadcast, so it
    * scales). Returns (bucket, n, lo_v, hi_v).
    */
  def equiDepthBuckets(
      df: DataFrame,
      valueCol: String,
      nBuckets: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val cuts = discCutpoints(df, valueCol, (1 until nBuckets), nBuckets)
    val bucket = (0 until nBuckets - 1)
      .map(i => when(v > col(s"__c$i"), 1L).otherwise(0L))
      .reduceLeft[Column](_ + _)
    df.crossJoin(broadcast(cuts))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), min(v).as("lo_v"), max(v).as("hi_v"))
      .orderBy("bucket")
  }

  /** DuckDB SQL equivalent of [[equiDepthBuckets]]. */
  def equiDepthBucketsSql(src: String, valueCol: String, nBuckets: Int): String = {
    val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cutCols = qs.zipWithIndex.map { case (q, i) =>
      s"CAST(quantile_disc($valueCol, $q) AS DOUBLE) AS c$i"
    }.mkString(",\n    ")
    val bucket = qs.indices
      .map(i => s"(CASE WHEN CAST($valueCol AS DOUBLE) > c$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH cuts AS (
       |  SELECT $cutCols FROM $src)
       |SELECT CAST($bucket AS BIGINT) AS bucket, COUNT(*) AS n,
       |  min(CAST($valueCol AS DOUBLE)) AS lo_v,
       |  max(CAST($valueCol AS DOUBLE)) AS hi_v
       |FROM $src CROSS JOIN cuts
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
