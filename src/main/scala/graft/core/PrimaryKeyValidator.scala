package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Validation outcome summary (reference
  * `PrimaryKeyValidationResult`, `primary_key_validator.go:19-26`).
  */
final case class PkValidationReport(
    total: Long,
    valid: Long,
    byReason: Map[String, Long],
    samples: Seq[Row]) {
  def isValid: Boolean = valid == total
}

/** Strict primary-key validation (reference
  * `primary_key_validator.go:57-136` `ValidateAllRecords`), as one
  * distributed classification pass instead of a row-at-a-time loop.
  *
  * Each row gets a reason label with the reference's precedence:
  *   1. `null_or_empty`  — SQL NULL or a null-like literal
  *   2. `invalid_format` — control chars, >255 chars, untrimmed space
  *   3. `duplicate`      — canonical key seen more than once
  *   4. `valid`
  *
  * Duplicate counting shuffles once on the canonical key (window
  * count); null-like rows are excluded from that partition so a million
  * NULL keys don't all land in one task.
  */
object PrimaryKeyValidator {
  val ReasonCol = "__pk_reason"

  val ReasonNullOrEmpty = "null_or_empty"
  val ReasonInvalidFormat = "invalid_format"
  val ReasonDuplicate = "duplicate"
  val ReasonValid = "valid"

  /** Adds [[ReasonCol]] classifying each row's `pk` value.
    *
    * Duplicate detection is a groupBy + broadcast-able join back, not a
    * window: a window would shuffle every row into key partitions, and
    * all null-like keys would land in ONE task — the classic null-key
    * skew. With groupBy, null-like rows never enter the aggregate, and
    * map-side partial aggregation compacts the rest.
    */
  def classify(df: DataFrame, pk: String): DataFrame = {
    val raw = df(pk).cast("string")
    val key = Canonical.canonical(df(pk), df.schema(pk).dataType)
    val nullish = Canonical.isNullOrEmpty(raw)
    val withKey = df.withColumn("__pk_key",
      when(nullish, lit(null)).otherwise(key))
    val dupCounts = withKey
      .filter(col("__pk_key").isNotNull)
      .groupBy(col("__pk_key"))
      .agg(count(lit(1)).as("__pk_cnt"))
      .filter(col("__pk_cnt") > 1)
    withKey
      .join(dupCounts, Seq("__pk_key"), "left")
      .withColumn(ReasonCol,
        when(col("__pk_key").isNull, ReasonNullOrEmpty)
          .when(Canonical.invalidPkFormat(col(pk).cast("string")), ReasonInvalidFormat)
          .when(col("__pk_cnt").isNotNull, ReasonDuplicate)
          .otherwise(ReasonValid))
      .drop("__pk_key", "__pk_cnt")
  }

  /** Per-reason rollup (reference `primary_key_validator.go:193-197`). */
  def report(df: DataFrame, pk: String, sampleSize: Int = 10): PkValidationReport = {
    val classified = classify(df, pk).cache()
    try {
      val counts = classified
        .groupBy(ReasonCol).count()
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      val total = counts.values.sum
      val valid = counts.getOrElse(ReasonValid, 0L)
      // Report only the first N offending rows (reference caps at 10,
      // `primary_key_validator.go:248-263`).
      val samples =
        if (valid == total) Seq.empty
        else classified.filter(col(ReasonCol) =!= ReasonValid)
          .limit(sampleSize).collect().toSeq
      PkValidationReport(total, valid, counts - ReasonValid, samples)
    } finally classified.unpersist()
  }

  /** Strict-mode gate: throws if any row is invalid (reference aborts
    * the sync, `main.go:116-124`).
    */
  def validateStrict(df: DataFrame, pk: String): PkValidationReport = {
    val r = report(df, pk)
    if (!r.isValid) {
      val detail = r.byReason.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(", ")
      throw new IllegalArgumentException(
        s"primary key validation failed for column '$pk': $detail " +
          s"(${r.total - r.valid} of ${r.total} rows invalid)")
    }
    r
  }
}
