package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage: fuzzy matching and golden-record survivorship.
  *
  * The reference engine's diff/sync matches rows by EXACT canonical
  * primary key (mydatasyncer `dbsync.go:695-715`); linkage generalizes
  * that to dirty keys — near-identical names, typos — the way a
  * large-scale entity-resolution pipeline needs:
  *
  *   1. BLOCK: a cheap deterministic key buckets plausibly-matching
  *      records (first token + length bucket here). All-pairs
  *      comparison is O(n^2) and dead at 100 TB; blocking makes the
  *      candidate set proportional to the duplicate rate. The join is
  *      a plain equi-join on the block key, so Catalyst shuffles both
  *      sides once by block and AQE handles a skewed block.
  *   2. VERIFY: exact `levenshtein` only on in-block pairs — the
  *      expensive predicate never sees the cross product.
  *   3. SURVIVE: per linked cluster, assemble the "golden record" by
  *      taking each column's most recent non-null value (ordered
  *      window + `first(ignoreNulls)`), one output row per cluster.
  */
object Linkage {

  /** Blocking key: lowercased first whitespace token plus a coarse
    * length bucket. Two strings within edit distance `maxDist` rarely
    * disagree on both; tighter recall needs multi-pass blocking (call
    * [[blockedFuzzyPairs]] per key and union).
    */
  def blockKey(c: Column): Column =
    concat_ws("#",
      lower(element_at(split(c, "\\s+"), 1)),
      (length(c) / 8).cast("long").cast("string"))

  /** Candidate pairs within one block whose `nameCol` values are
    * within `maxDist` edits. Emits `(id_a, id_b, name_a, name_b,
    * dist)` with `id_a < id_b` (each unordered pair once).
    */
  def blockedFuzzyPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int,
      blockOf: Column => Column = blockKey): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      blockOf(col(nameCol)).as("__blk"))
    val b = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      blockOf(col(nameCol)).as("__blk"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      // cheap length pre-filter: |len(a)-len(b)| is a lower bound on
      // edit distance, so most in-block pairs skip the DP entirely
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }

  /** Golden record per cluster: for every column in `valueCols`, the
    * first non-null value in decreasing `orderCol` order (latest wins,
    * older rows fill gaps); ties broken by `idCol` descending so the
    * result is deterministic. One row per cluster.
    *
    * One window + one aggregate, both keyed on the cluster — a single
    * shuffle, no per-column subqueries.
    */
  def goldenRecord(
      df: DataFrame,
      clusterCol: String,
      orderCol: String,
      idCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(orderCol).desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val picked = valueCols.map(c =>
      first(col(c), ignoreNulls = true).over(w).as(c))
    val rn = row_number().over(
      Window.partitionBy(col(clusterCol)).orderBy(col(orderCol).desc, col(idCol).desc))
    df.select(col(clusterCol) +: picked :+ rn.as("__rn"): _*)
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
