package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the closest right row at or
  * before ([[backward]]) / at or after ([[forward]]) the left row's
  * time, matched on an equi-key.
  *
  * Spark has no built-in as-of join. The naive encoding — a range
  * join + groupBy-max — explodes to |L| x |R per key| intermediate rows.
  * This implementation instead unions both sides and runs ONE window
  * pass (`last(..., ignoreNulls)` over rows preceding in the scan
  * order), so the cost is a single shuffle + sort of |L| + |R| rows:
  * linear, skew-tolerant, and the same plan shape at 100 TB as at 1 MB.
  * The forward direction is the same pass with the scan order reversed.
  *
  * Semantics: inclusive (a right row at exactly the left row's time
  * matches). The right side must be unique per (key, time) — pre-reduce
  * with [[latestPerKeyTime]] otherwise, or the winner among ties is
  * unspecified.
  */
object AsOfJoin {

  /** Reduce the right side to one row per (key, time): the row with the
    * greatest `tieBreak` value wins.
    */
  def latestPerKeyTime(
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(timeCol))
      .orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Latest right row with rightTime <= leftTime. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      inner: Boolean = true): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, rightCols,
      inner, descending = false)

  /** Earliest right row with rightTime >= leftTime. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      inner: Boolean = true): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, rightCols,
      inner, descending = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      inner: Boolean,
      descending: Boolean): DataFrame = {
    val lCols = left.columns.toSeq

    val reserved = Seq("__k", "__t", "__side", "__r")
    val reservedClash = lCols.filter(reserved.contains)
    require(reservedClash.isEmpty,
      s"left columns clash with internal as-of columns: ${reservedClash.mkString(", ")}")
    val outClash = rightCols.filter(lCols.contains)
    require(outClash.isEmpty,
      s"rightCols clash with left columns: ${outClash.mkString(", ")} — rename before joining")
    val missing = rightCols.filterNot(right.columns.contains)
    require(missing.isEmpty,
      s"rightCols not present on right side: ${missing.mkString(", ")}")

    // SQL theta-join semantics: NULL keys/times never match. Right rows
    // with NULL key or time are inert (and would otherwise poison the
    // window scan — NULLS FIRST under asc ordering puts them before
    // every real row); left rows with NULL key/time are unmatched —
    // dropped for inner, carried through with null right columns for
    // outer.
    val leftValid = left.filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
    val leftInvalid = left.filter(col(leftKey).isNull || col(leftTime).isNull)
    val right0 = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    return asofValid(leftValid, right0, leftKey, rightKey, leftTime, rightTime,
      rightCols, inner, descending) match {
      case matched if inner => matched
      case matched =>
        matched.unionByName(leftInvalid.select(
          lCols.map(col) ++
            rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*))
    }
  }

  private def asofValid(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      inner: Boolean,
      descending: Boolean): DataFrame = {
    val lCols = left.columns.toSeq

    // All right columns travel in ONE struct and are gap-filled in one
    // last(ignoreNulls) pass: filling columns independently would mix
    // fields of different right rows whenever a matched row carries a
    // NULL in one column (the fill would skip past it to an older row).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      Seq(
        col(leftKey).cast("string").as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side")) ++
        lCols.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      Seq(
        col(rightKey).cast("string").as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)

    // Right rows sort before left rows at equal time (side 0 < 1), which
    // makes the match inclusive in both directions.
    val timeOrder: Column = if (descending) col("__t").desc else col("__t").asc
    val w = Window.partitionBy("__k").orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val leftRows = filled.filter(col("__side") === 1)
    val matched = if (inner) leftRows.filter(col("__r").isNotNull) else leftRows
    matched.select(
      lCols.map(col) ++ rightCols.map(c => col("__r").getField(c).as(c)): _*)
  }
}
