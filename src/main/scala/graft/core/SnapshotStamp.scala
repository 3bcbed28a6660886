package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Corpus snapshot stamps for stored artifacts.
  *
  * Every stored artifact in the suite (curation state, gate model +
  * sweep, probe sweep, reference LM) is a MEASUREMENT of a source
  * corpus; serving it against a corpus that has since changed silently
  * serves stale decisions. The memos' documented contract is
  * immutable-inputs-only — this module is the production-shaped guard
  * for everything else: an order-independent corpus fingerprint
  * written BESIDE the artifact at build time, and a fail-fast
  * freshness check at read time.
  *
  * The stamp is (n_rows, id_hash): row count plus the exact integer
  * sum of the first-8-hex-digit value of `md5(salt || id)` per row —
  * one partial-aggregated pass over the id column, no sort, no
  * collect, insensitive to row order and partitioning (sum is
  * commutative), and decimal(38,0) so a trillion-row corpus cannot
  * overflow it. Two corpora agreeing on both fields differ only with
  * md5-collision probability; any insert, delete, or id change moves
  * the stamp.
  */
object SnapshotStamp {

  /** The per-row hash term: first 8 hex digits of `md5(salt || id)`
    * as an exact integer in [0, 2^32) — the [[Sampling.hexPrefixValue]]
    * arithmetic, shared with the salted-sampling oracles.
    */
  private def rowHash(idCol: Column, salt: String): Column =
    Sampling.hexPrefixValue(md5(concat(lit(salt), idCol.cast("string"))))

  /** The 1-row stamp frame (n_rows, id_hash) of `df`'s `idCol`.
    * `id_hash` is surfaced as the exact decimal's canonical STRING:
    * engines' client bridges (DuckDB→pandas) demote wide decimals to
    * float64, which silently corrupts past 2^53 — a string is exact at
    * any corpus scale and compares exactly.
    */
  def stamp(df: DataFrame, idCol: String, salt: String = "stamp:"): DataFrame =
    df.select(rowHash(col(idCol), salt).cast("decimal(38,0)").as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("__h")), lit(0L).cast("decimal(38,0)"))
          .cast("string").as("id_hash"))

  /** DuckDB twin of [[stamp]] — one SELECT over `src`. */
  def stampSql(src: String, idCol: String, salt: String = "stamp:"): String = {
    val hex = Sampling.hexPrefixSql(s"md5('$salt' || CAST($idCol AS VARCHAR))")
    s"""SELECT COUNT(*) AS n_rows,
       |  CAST(CAST(COALESCE(SUM($hex), 0) AS DECIMAL(38,0)) AS VARCHAR) AS id_hash
       |FROM $src""".stripMargin
  }

  /** Write the stamp of `df` to `path` — call at artifact build time,
    * with `path` a sibling of the artifact tables.
    */
  def write(df: DataFrame, idCol: String, path: String,
      salt: String = "stamp:"): Unit =
    stamp(df, idCol, salt).coalesce(1).write.mode("overwrite").parquet(path)

  /** Recompute the live stamp and compare against the stored one.
    * One aggregate job over the live id column plus a 1-row artifact
    * read.
    */
  def isFresh(live: DataFrame, idCol: String, path: String,
      salt: String = "stamp:"): Boolean = {
    val spark = live.sparkSession
    val stored = readStamp(spark, path)
    val now = stamp(live, idCol, salt).collect()(0)
    stored == ((now.getLong(0), now.getString(1)))
  }

  /** [[isFresh]] that fails fast with a named error carrying both
    * stamps — the read-side gate a production deploy path calls before
    * serving a stored artifact.
    */
  def assertFresh(live: DataFrame, idCol: String, path: String,
      salt: String = "stamp:"): Unit = {
    val spark = live.sparkSession
    val stored = readStamp(spark, path)
    val nowRow = stamp(live, idCol, salt).collect()(0)
    val now = (nowRow.getLong(0), nowRow.getString(1))
    require(stored == now,
      s"stale artifact stamp at $path: stored (n_rows, id_hash) = $stored " +
        s"but the live corpus is $now — rebuild the artifact before serving it")
  }

  private def readStamp(spark: SparkSession, path: String): (Long, String) = {
    val rows = spark.read.parquet(path)
      .select(col("n_rows"), col("id_hash")).collect()
    require(rows.length == 1 && !rows(0).isNullAt(0) && !rows(0).isNullAt(1),
      s"snapshot stamp at $path is not exactly one non-null row")
    (rows(0).getLong(0), rows(0).getString(1))
  }
}
