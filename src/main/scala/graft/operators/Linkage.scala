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

  /** Sorted-neighborhood near-duplicates (Hernández & Stolfo,
    * SIGMOD'95): sort documents by a normalized prefix key WITHIN
    * coarse prefix buckets, compare each document only against the
    * next `window` documents in sort order, and keep pairs whose
    * capped texts are within `maxDist` edits —
    * `(d1, d2, edit_dist)` with `d1 < d2`.
    *
    * The third blocking geometry in the dedup family, orthogonal to
    * hash buckets (LSH q22, SimHash q109) and equality blocks (prefix
    * q130): SNM catches pairs that are CLOSE IN ORDER without being
    * equal on any derived key — trailing edits, small insertions —
    * and its candidate count is exactly `window` per document by
    * construction, the strongest output bound any blocker here gives.
    *
    * Scale shape: the sort is per-BUCKET (a keyed window over the
    * `bucketLen`-char prefix — one shuffle, no global sort, no single
    * reducer). The rank self-join is a PURE equi-join on
    * `(bucket, rank)`: the left side explodes each row to its `window`
    * expected partner ranks (ra+1 .. ra+window) and joins them against
    * the right side's actual rank, so the join emits EXACTLY the SNM
    * candidate set — `window` pairs per document under any bucket
    * skew, with no residual rank predicate at all. That matters twice
    * over: a bucket-only key enumerates O(|bucket|^2) pairs on a
    * template-heavy corpus (skewed prefix buckets), and any residual
    * predicate ordering is not a contract Catalyst keeps — pushed
    * filter conjuncts land AHEAD of the original join condition, so a
    * residual rank band cannot be relied on to gate the O(len*maxDist)
    * edit-distance DP (measured: the reordered conjunction doubled the
    * DP count). With the exact-candidate join the DP runs once per
    * candidate by construction: the threshold form of `levenshtein`
    * (banded DP, early bail, -1 past `maxDist`) under a SINGLE
    * conjunct (`>= 0` — `between` would split into two conjuncts and
    * evaluate the DP twice), behind a cheap length prune
    * (|len1-len2| lower-bounds edit distance). The explode multiplies
    * the left side's shuffle by `window`, but only the `maxChars`-capped
    * compare text rides it — linear, and the DP it bounds is the
    * operator's entire cost.
    * Pairs straddling a bucket boundary are missed — the standard SNM
    * trade, recovered in practice by a second pass under a different
    * key (call again with another normalization and union).
    */
  def sortedNeighborhoodNearDup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bucketLen: Int = 4,
      sortLen: Int = 40,
      window: Int = 5,
      maxChars: Int = 200,
      maxDist: Int = 60): DataFrame = {
    require(window >= 1 && bucketLen >= 1 && sortLen >= bucketLen,
      "window/bucketLen positive, sortLen >= bucketLen")
    val norm = lower(col(textCol))
    val ranked = docs.select(col(idCol),
        substring(norm, 1, bucketLen).as("__bk"),
        substring(norm, 1, sortLen).as("__sk"),
        substring(col(textCol), 1, maxChars).as("__t"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__bk")).orderBy(col("__sk"), col(idCol))))
    val a = ranked.select(col("__bk"), col("__rn").as("__ra"),
        col(idCol).as("__ida"), col("__t").as("__ta"))
      .withColumn("__rb", explode(sequence(col("__ra") + 1, col("__ra") + window)))
    val b = ranked.select(col("__bk"), col("__rn").as("__rb"),
      col(idCol).as("__idb"), col("__t").as("__tb"))
    // edit_dist is exact for every kept pair: the thresholded DP
    // returns the true distance whenever it is <= maxDist, so the
    // oracle's plain-levenshtein filter selects the same pairs.
    a.join(b, Seq("__bk", "__rb"))
      .filter(abs(length(col("__ta")) - length(col("__tb"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("__ta"), col("__tb"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0)
      .select(
        least(col("__ida"), col("__idb")).as("d1"),
        greatest(col("__ida"), col("__idb")).as("d2"),
        col("edit_dist"))
      .orderBy("d1", "d2")
  }

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
      // thresholded banded DP: -1 past maxDist, exact distance within;
      // single `>= 0` conjunct — `between` would split in two and
      // evaluate the DP twice inside the pushed join condition
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
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
