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
  def bucketedIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      startCol: String,
      endCol: String,
      rightCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    val b = lit(bucketSeconds * 1000000L)
    val l = left
      .withColumn("__bucket", (unix_micros(col(leftTime)) / b).cast("long"))
      .withColumn("__k", col(leftKey).cast("string"))
    val r = right
      .withColumn("__bucket",
        explode(sequence(
          (unix_micros(col(startCol)) / b).cast("long"),
          (unix_micros(col(endCol)) / b).cast("long"))))
      .select(
        col(rightKey).cast("string").as("__k") +:
          col("__bucket") +:
          col(startCol) +: col(endCol) +:
          rightCols.map(col): _*)
    l.join(r, Seq("__k", "__bucket"))
      .filter(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .drop("__k", "__bucket", startCol, endCol)
  }
}
