package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: rows of the same key belong to one session
  * while consecutive timestamps are within `gap`; a larger gap starts a
  * new session.
  *
  * Classic lag + running-sum formulation: one shuffle + sort per key,
  * then a linear pass — the batch twin of Structured Streaming's
  * session windows (see `graft.streaming.EventStreams` for the
  * streaming form). Skewed keys stay bounded because per-key state is a
  * sort, not a materialized group.
  */
object Sessionize {
  val SessionCol = "__session_id"

  /** Adds [[SessionCol]] (1-based per-key session index). `tieBreak`
    * makes ordering total when timestamps collide.
    */
  def assignSessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val boundary = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn(SessionCol,
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Session summaries: (key, session start/end in epoch micros, event
    * count), one row per session.
    */
  def sessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: String): DataFrame =
    assignSessions(df, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col(SessionCol))
      .agg(
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        count(lit(1)).as("n_events"))
      .drop(SessionCol)
}
