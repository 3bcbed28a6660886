package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking
import graft.streaming.StreamingPerplexity

/** Incremental count-merge for the KEYED reference-LM fleet: a delta
  * mixing languages merges into the stored per-language tables in one
  * pass, bit-identical to a from-scratch keyed retrain on the union —
  * per-language corpora grow at different rates, and retraining a
  * hundred languages because one grew is the anti-pattern this closes.
  */
class KeyedRefLmMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def baseDocs = Seq(
    (1L, "a b a b a", "L1"),
    (2L, "b c", "L1"),
    (3L, "a b a b a b", "L2")
  ).toDF("id", "text", "lang")

  // the delta mixes languages AND introduces a brand-new key (L3):
  // the merge must grow L1, leave L2's counts untouched by L1's
  // delta, and create L3's model from nothing
  private def deltaDocs = Seq(
    (10L, "b c b", "L1"),
    (11L, "c a c a", "L3")
  ).toDF("id", "text", "lang")

  private def uniSet(m: Ranking.KeyedRefLmModel) =
    m.unigrams.as[(String, String, Long)].collect().toSet
  private def bigSet(m: Ranking.KeyedRefLmModel) =
    m.bigrams.as[(String, String, String, Long)].collect().toSet
  private def totSet(m: Ranking.KeyedRefLmModel) =
    m.totals.as[(String, Long, Long)].collect().toSet

  test("keyed merge == keyed retrain on the union; replay-guarded; new keys appear") {
    val dir = Files.createTempDirectory("keyed-reflm-merge").toString
    val p = s"$dir/model"
    Ranking.writeKeyedRefLm(
      Ranking.refLmTrainByKey(baseDocs, "id", "text", "lang", lit(true)), p)
    assert(Ranking.mergeIntoStoredKeyedRefLm(spark, p, deltaDocs,
      "id", "text", "lang", batchId = Some(7L)))
    val merged = Ranking.readKeyedRefLm(spark, p)
    val full = Ranking.refLmTrainByKey(
      baseDocs.unionByName(deltaDocs), "id", "text", "lang", lit(true))
    assert(uniSet(merged) == uniSet(full))
    assert(bigSet(merged) == bigSet(full))
    assert(totSet(merged) == totSet(full))
    // L3 was born in the merge; L2 is untouched by the delta
    assert(totSet(merged).exists(_._1 == "L3"))
    assert(totSet(merged).filter(_._1 == "L2") ==
      totSet(Ranking.refLmTrainByKey(baseDocs, "id", "text", "lang",
        lit(true))).filter(_._1 == "L2"))
    // scoring under merged vs retrained is identical for every key
    val pool = Seq((20L, "a b c", "L1"), (21L, "a b c", "L2"),
      (22L, "c a", "L3")).toDF("id", "text", "lang")
    assert(Ranking.refLmScoreByKey(pool, "id", "text", "lang", merged)
        .as[(Long, String, Long, Double)].collect().toSet ==
      Ranking.refLmScoreByKey(pool, "id", "text", "lang", full)
        .as[(Long, String, Long, Double)].collect().toSet)
    // a replayed batch id is a no-op
    assert(!Ranking.mergeIntoStoredKeyedRefLm(spark, p, deltaDocs,
      "id", "text", "lang", batchId = Some(7L)))
    assert(uniSet(Ranking.readKeyedRefLm(spark, p)) == uniSet(full))
    // staging/old siblings are gone after the swap
    assert(new java.io.File(dir).list().toSet == Set("model"))
  }

  test("keyed order-3 merge == keyed order-3 retrain on the union; replay-guarded") {
    val dir = Files.createTempDirectory("keyed-reflm3-merge").toString
    val p = s"$dir/model"
    Ranking.writeKeyedRefLm3(
      Ranking.refLm3TrainByKey(baseDocs, "id", "text", "lang", lit(true)), p)
    assert(Ranking.mergeIntoStoredKeyedRefLm3(spark, p, deltaDocs,
      "id", "text", "lang", batchId = Some(3L)))
    val merged = Ranking.readKeyedRefLm3(spark, p)
    val full = Ranking.refLm3TrainByKey(
      baseDocs.unionByName(deltaDocs), "id", "text", "lang", lit(true))
    assert(merged.trigrams.as[(String, String, String, String, Long)]
        .collect().toSet ==
      full.trigrams.as[(String, String, String, String, Long)].collect().toSet)
    assert(merged.triContexts.as[(String, String, String, Long)]
        .collect().toSet ==
      full.triContexts.as[(String, String, String, Long)].collect().toSet)
    assert(uniSet(merged.base) == uniSet(full.base))
    assert(totSet(merged.base) == totSet(full.base))
    val pool = Seq((20L, "a b a c", "L1"), (21L, "a b a c", "L2"),
      (22L, "c a c", "L3")).toDF("id", "text", "lang")
    assert(Ranking.refLm3ScoreByKey(pool, "id", "text", "lang", merged)
        .as[(Long, String, Long, Double)].collect().toSet ==
      Ranking.refLm3ScoreByKey(pool, "id", "text", "lang", full)
        .as[(Long, String, Long, Double)].collect().toSet)
    assert(!Ranking.mergeIntoStoredKeyedRefLm3(spark, p, deltaDocs,
      "id", "text", "lang", batchId = Some(3L)))
  }

  test("streaming keyed ingest merges mixed-language micro-batches replay-idempotently") {
    val dir = Files.createTempDirectory("keyed-reflm-stream").toString
    val p = s"$dir/model"
    Ranking.writeKeyedRefLm(
      Ranking.refLmTrainByKey(baseDocs, "id", "text", "lang", lit(true)), p)
    val batch = Seq((10L, "b c b", "L1"), (11L, "c a", "L2"))
      .toDF("doc_id", "text", "lang")
    assert(StreamingPerplexity.ingestReferenceByKeyBatch(
      batch, "doc_id", "text", "lang", p, batchId = 0L))
    val once = uniSet(Ranking.readKeyedRefLm(spark, p))
    assert(!StreamingPerplexity.ingestReferenceByKeyBatch(
      batch, "doc_id", "text", "lang", p, batchId = 0L))
    assert(uniSet(Ranking.readKeyedRefLm(spark, p)) == once)
    // counts are bit-equal to one clean delivery over the union
    assert(once == uniSet(Ranking.refLmTrainByKey(
      baseDocs.unionByName(batch.toDF("id", "text", "lang")),
      "id", "text", "lang", lit(true))))
  }
}
