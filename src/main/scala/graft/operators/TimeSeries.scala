package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping over event tables: gap-filled resampling and
  * rolling anomaly scores.
  *
  * Both are single-shuffle plans keyed on the series id. Resampling
  * densifies with `sequence()` + `explode` — the generated rows are
  * proportional to the time span per key, never to the table size —
  * and the rolling statistics use one window with exact decimal sums
  * (double accumulation drifts and is order-dependent; decimal sums
  * are associative, so partial aggregation stays enabled).
  */
object TimeSeries {

  /** Per-key counts at `unitMicros` granularity with missing buckets
    * filled as 0, spanning each key's own [min, max] bucket range.
    * Output: (key, bucket_us, n).
    *
    * The dense bucket axis comes from ONE aggregate row per key
    * (min/max), exploded — so the plan is: partial-agg counts (one
    * shuffle), tiny per-key span frame, explode, left join back on
    * (key, bucket). The join's left side is the exploded axis whose
    * size is bounded by span/unit per key.
    */
  def resampleCounts(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      unitMicros: Long,
      maxBucketsPerKey: Long = 1L << 21): DataFrame = {
    // integer bucket math: `/` on longs is DOUBLE division in Spark and
    // corrupts epoch micros past 2^53 — subtract the pmod remainder instead
    val us = unix_micros(col(tsCol))
    val bucket = us - pmod(us, lit(unitMicros))
    val counts = df
      .select(col(keyCol).as("__k"), bucket.as("bucket_us"))
      .groupBy("__k", "bucket_us")
      .agg(count(lit(1)).as("__n"))
    // guard the densification: ONE key with a corrupt outlier timestamp
    // (epoch 0 next to 2024, say) would make sequence() materialize a
    // multi-million-element array in a single row. Fail loudly with the
    // offending key instead of silently OOMing the executor.
    val span = (col("__hi") - col("__lo")) / lit(unitMicros)
    // the guard lives INSIDE sequence's start argument — a standalone
    // guard column would be pruned away as unused and never evaluate
    val guardedLo = when(span < maxBucketsPerKey, col("__lo"))
      .otherwise(raise_error(concat(
        lit("resampleCounts: key "), col("__k").cast("string"),
        lit(s" spans more than $maxBucketsPerKey buckets — corrupt "),
        lit("timestamps, or raise maxBucketsPerKey"))).cast("long"))
    val axis = counts
      .groupBy("__k")
      .agg(min(col("bucket_us")).as("__lo"), max(col("bucket_us")).as("__hi"))
      .select(col("__k"),
        explode(sequence(guardedLo, col("__hi"), lit(unitMicros))).as("bucket_us"))
    axis.join(counts, Seq("__k", "bucket_us"), "left")
      .select(col("__k").as(keyCol), col("bucket_us"),
        coalesce(col("__n"), lit(0L)).as("n"))
  }

  /** Rolling z-score over the previous `nPrev` rows (the current row
    * EXCLUDED, so a spike doesn't mask itself): how many sample
    * standard deviations the current value sits from the trailing
    * mean. Rows without a full trailing window or with zero variance
    * get NULL. Output adds (mean_prev, z).
    *
    * Sums are exact decimals; mean/variance derive from them in double
    * at the end, so results are deterministic under any partitioning.
    */
  def rollingZscore(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      nPrev: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-nPrev, -1)
    val vDec = col(valueCol).cast("decimal(18,4)")
    val s1 = sum(vDec).over(w)
    val s2 = sum((vDec * vDec).cast("decimal(38,8)")).over(w)
    val n = count(vDec).over(w)
    val mean = s1.cast("double") / n
    // sample variance from exact sums: (s2 - s1^2/n) / (n-1)
    val variance = (s2.cast("double") - s1.cast("double") * s1.cast("double") / n) /
      (n - lit(1))
    df.withColumn("__s1", s1)
      .withColumn("__s2", s2)
      .withColumn("__np", n)
      .withColumn("mean_prev",
        when(col("__np") === nPrev, s1.cast("double") / col("__np")))
      .withColumn("z",
        when(col("__np") === nPrev && variance > 0,
          (col(valueCol) - mean) / sqrt(variance)))
      .drop("__s1", "__s2", "__np")
  }
}
