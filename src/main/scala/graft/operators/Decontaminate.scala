package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Benchmark decontamination: flag corpus documents sharing verbatim
  * n-gram shingles with an evaluation set.
  *
  * The standard pre-training hygiene step: any training document that
  * contains an eval-set n-gram (n ~ 8..13 words) is suspect. Expressed
  * relationally — explode both sides to (doc, shingle) rows and join on
  * the shingle — the check is one hash join keyed by shingle text and
  * scales to any corpus size; the eval side is tiny and broadcasts.
  */
object Decontaminate {

  /** Corpus documents sharing at least one `n`-gram with `evalDocs`.
    * Output: (idCol, n_hits = number of distinct shared shingles).
    *
    * Strict shingling: documents shorter than `n` tokens emit no
    * shingles at all — a short eval item contained verbatim in a long
    * document is NOT detected by this n-gram pass (run it again with a
    * smaller `n`, or a substring pass, for short eval items).
    */
  def flagContaminated(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val corpusSh = Dedup.shingleRows(corpus, idCol, textCol, n, strict = true)
    val evalSh = broadcast(
      Dedup.shingleRows(evalDocs, idCol, textCol, n, strict = true)
        .select(col("__sh")).distinct())
    corpusSh.join(evalSh, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[flagContaminated]] with a Bloom-filter prefilter: build a Bloom
    * filter over the eval shingles (one distributed aggregate), drop
    * every corpus shingle the filter rejects BEFORE the join, then
    * confirm survivors with the exact join — false positives cost a
    * lookup, never a wrong answer, so results are identical to
    * [[flagContaminated]].
    *
    * This is the shape that survives scale inversion: when the eval set
    * is too big to broadcast as a hash relation, its Bloom filter (a
    * few MB for hundreds of millions of shingles at 1% fpp) still is,
    * and it prunes the corpus-side shuffle to near-nothing.
    */
  def flagContaminatedBloom(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      expectedShingles: Long = 1000000L): DataFrame = {
    val evalSh = Dedup.shingleRows(evalDocs, idCol, textCol, n, strict = true)
      .select(col("__sh")).distinct()
    val bloom = Sketches.buildBloom(evalSh, col("__sh"), expectedShingles)
    val corpusSh = Dedup.shingleRows(corpus, idCol, textCol, n, strict = true)
      .filter(Sketches.mightContain(lit(bloom), col("__sh")))
    corpusSh.join(evalSh, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-(corpus, eval) pair asymmetric containment: the fraction of an
    * eval item's distinct `n`-gram shingles that appear verbatim in the
    * corpus document — `|shingles(eval) ∩ shingles(corpus)| /
    * |shingles(eval)|`. [[flagContaminated]] answers "is this training
    * doc suspect at all"; this answers "WHICH benchmark item leaked into
    * it, and how completely" (containment 1.0 = the eval item is fully
    * embedded), which is what a decontamination report has to show per
    * eval task.
    *
    * Shape: both sides explode to distinct (doc, shingle) rows, the eval
    * side (tiny: a benchmark) broadcasts into one hash join, and the
    * pair counts partial-aggregate before the single (cid, eid) shuffle.
    * The corpus side never shuffles its text — only matched shingle hits
    * move. If the eval set ever outgrew broadcast, drop the two
    * `broadcast` hints and the same plan runs as shuffle joins keyed on
    * the shingle — no logic change.
    *
    * Output: `(cid, eid, n_shared, n_eval, containment)`, one row per
    * pair with containment ≥ `minContainment`.
    */
  def containmentPairs(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minContainment: Double = 0.0): DataFrame = {
    val evalSh = Dedup.shingleRows(evalDocs, idCol, textCol, n, strict = true)
      .select(col(idCol).as("eid"), col("__sh"))
    val evalSizes = evalSh.groupBy("eid").agg(count(lit(1)).as("n_eval"))
    val corpusSh = Dedup.shingleRows(corpus, idCol, textCol, n, strict = true)
      .select(col(idCol).as("cid"), col("__sh"))
    corpusSh.join(broadcast(evalSh), "__sh")
      .groupBy("cid", "eid")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(evalSizes), "eid")
      .withColumn("containment",
        round(col("n_shared") / col("n_eval").cast("double"), 6))
      .filter(col("containment") >= minContainment)
      .select("cid", "eid", "n_shared", "n_eval", "containment")
  }
}
