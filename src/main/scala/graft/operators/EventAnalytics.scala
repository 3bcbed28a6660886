package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered funnels and cohort retention. Both are
  * aggregation-reshape pipelines — per-key groupBys and one re-join, no
  * windows over the raw log — so they scale with the number of USERS,
  * not events, after the first aggregate.
  */
object EventAnalytics {

  /** Two-step ordered funnel: for each user, did `step2` happen
    * strictly after their first `step1`? Output: one row per user with
    * stage ∈ none | step1_only | converted.
    */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      step1: String,
      step2: String): DataFrame = {
    val first = events.filter(col(typeCol) === step1)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__ts1"))
    val conv = events.filter(col(typeCol) === step2)
      .join(first, userCol)
      .filter(col(tsCol) > col("__ts1"))
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__ts2"))
    events.select(col(userCol)).distinct()
      .join(first, Seq(userCol), "left")
      .join(conv, Seq(userCol), "left")
      .select(col(userCol),
        when(col("__ts1").isNull, "none")
          .when(col("__ts2").isNull, s"${step1}_only")
          .otherwise("converted").as("stage"))
  }

  /** Cohort retention: users grouped by the day of their first event;
    * for each (cohort day, day offset), the count of distinct active
    * users.
    */
  def dailyRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("day", min(col(tsCol))).as("__cohort"))
    events.join(first, userCol)
      .groupBy(
        col("__cohort"),
        datediff(date_trunc("day", col(tsCol)), col("__cohort"))
          .cast("long").as("offset_day"))
      .agg(countDistinct(col(userCol)).as("active"))
      .select(
        unix_micros(col("__cohort")).as("cohort_us"),
        col("offset_day"), col("active"))
  }
}
