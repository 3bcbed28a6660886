package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point timestamp matched to
  * right rows carrying [start, end] intervals, plus an equi-key.
  *
  * The naive encoding is a theta join (`l.key = r.key AND l.t BETWEEN
  * r.s AND r.e`), which Spark executes as a broadcast nested-loop when
  * the predicate has no equi-part it can hash on beyond the key — fine
  * for a small interval side, quadratic pain otherwise. The bucketed
  * encoding makes it an EQUI join: intervals explode into the fixed-
  * width time buckets they cover, points map to their bucket, and the
  * join keys on (key, bucket) with the exact BETWEEN as a post-filter.
  * Cost: |R| x avg-buckets-per-interval replication, in exchange for a
  * hash-partitionable join that scales like any other shuffle join.
  */
object RangeJoin {

  /** @param left   rows with `leftKey` and point time `leftTime` (timestamp)
    * @param right  rows with `rightKey`, `startCol`, `endCol` (timestamps,
    *               inclusive bounds)
    * @param bucketSeconds bucket width; pick ~ the typical interval length
    * @param rightCols right columns carried onto matches
    */
  /** @param maxBucketsPerInterval hard guard: an interval spanning more
    *        buckets than this fails the job loudly (a sentinel end-date
    *        like 9999-12-31 would otherwise explode into millions of
    *        rows per interval and OOM quietly). Size `bucketSeconds` to
    *        the typical interval length so this stays small.
    */
  def bucketedIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      startCol: String,
      endCol: String,
      rightCols: Seq[String],
      bucketSeconds: Long,
      maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val clash = rightCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"rightCols ${clash.mkString(", ")} collide with left columns — alias them first")

    val b = lit(bucketSeconds * 1000000L)
    val l = left
      .withColumn("__bucket", (unix_micros(col(leftTime)) / b).cast("long"))
      .withColumn("__k", col(leftKey).cast("string"))
    val startB = (unix_micros(col(startCol)) / b).cast("long")
    val endB = (unix_micros(col(endCol)) / b).cast("long")
    val guardedEnd = when(endB - startB > maxBucketsPerInterval,
      raise_error(concat(
        lit(s"interval spans more than $maxBucketsPerInterval buckets at $bucketSeconds s/bucket: "),
        col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"))))
      .otherwise(endB)
    val r = right
      // inverted intervals match nothing (BETWEEN semantics), and an
      // unfiltered descending sequence would instead enumerate buckets
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bucket", explode(sequence(startB, guardedEnd)))
      .select(
        col(rightKey).cast("string").as("__k") +:
          col("__bucket") +:
          col(startCol).as("__rj_start") +: col(endCol).as("__rj_end") +:
          rightCols.map(col): _*)
    l.join(r, Seq("__k", "__bucket"))
      .filter(col(leftTime) >= col("__rj_start") && col(leftTime) <= col("__rj_end"))
      .drop("__k", "__bucket", "__rj_start", "__rj_end")
  }

  /** Interval x interval overlap join: pairs of rows (same `keyCol`)
    * whose inclusive integer ranges [startCol, endCol] intersect.
    * Output: (keyCol, a_id, b_id, overlap_start, overlap_end).
    *
    * Same bucketing idea as [[bucketedIntervalJoin]], with one twist
    * that removes the dedup shuffle a naive bucket self-join needs:
    * overlapping intervals share EVERY bucket their overlap covers, so
    * a pair would surface once per shared bucket — but the overlap's
    * first bucket (the one containing `greatest(a.start, b.start)`) is
    * provably covered by BOTH intervals and is unique per pair, so the
    * join emits a pair only there. No `distinct`, no post-join
    * exchange; the only shuffles are the (key, bucket) hash join's own.
    *
    * Bounds are integer (days, epoch-seconds — caller's choice of
    * unit); `bucketWidth` in the same unit, sized to the typical
    * interval length. The `maxBucketsPerInterval` guard fails loudly
    * on sentinel end-values, as in [[bucketedIntervalJoin]].
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      keyCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def buckets(df: DataFrame, p: String): DataFrame = {
      val sB = floor(col(startCol).cast("long") / bucketWidth).cast("long")
      val eB = floor(col(endCol).cast("long") / bucketWidth).cast("long")
      val guardedEnd = when(eB - sB > maxBucketsPerInterval,
        raise_error(concat(
          lit(s"interval spans more than $maxBucketsPerInterval buckets at width $bucketWidth: "),
          col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"))))
        .otherwise(eB)
      df.filter(col(startCol) <= col(endCol))
        .select(
          col(keyCol).as("__k"),
          col(idCol).as(s"${p}_id"),
          col(startCol).cast("long").as(s"__${p}s"),
          col(endCol).cast("long").as(s"__${p}e"),
          explode(sequence(sB, guardedEnd)).as("__bucket"))
    }
    buckets(left, "a").join(buckets(right, "b"), Seq("__k", "__bucket"))
      .filter(col("__as") <= col("__be") && col("__bs") <= col("__ae"))
      .filter(col("__bucket") ===
        floor(greatest(col("__as"), col("__bs")) / bucketWidth).cast("long"))
      .select(
        col("__k").as(keyCol), col("a_id"), col("b_id"),
        greatest(col("__as"), col("__bs")).as("overlap_start"),
        least(col("__ae"), col("__be")).as("overlap_end"))
  }
}
