package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.Dedup
import graft.streaming.StreamingFingerprints

final case class Fp(modality: String, doc_id: Long, simhash: String)

/** Streaming cross-modal fingerprint dedup: the ingest-time twin of
  * q166's single banded join — verified pairs across batches match the
  * batch operator, modality gates state, Hamming verifies in-state.
  */
class StreamingFingerprintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Real fixture fingerprints for two modalities: image grid hashes
    * and audio energy hashes over the planted twin design (base ids
    * 0..9, twins 120..129 at Hamming exactly 1).
    */
  private def fixtureFps: (Seq[Fp], Seq[Fp]) = {
    import spark.implicits._
    val ids = ((0L until 10L) ++ (120L until 130L)).toDF("doc_id")
    val img = Multimodal.imageGridHash(
        Multimodal.gridFixtureImages(ids, "doc_id", base = 120L), "doc_id")
      .collect().map(r => Fp("image", r.getLong(0), r.getString(1)))
    val aud = Multimodal.audioEnergyHash(
        Multimodal.audioGridFixtures(ids, "doc_id", base = 120L), "doc_id")
      .collect().map(r => Fp("audio", r.getLong(0), r.getString(1)))
    val all = img ++ aud
    (all.filter(_.doc_id < 120).toSeq, all.filter(_.doc_id >= 120).toSeq)
  }

  test("streamed verified pairs across batches match the batch cross-modal join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (baseFps, twinFps) = fixtureFps

    val stream = MemoryStream[Fp]
    val out = StreamingFingerprints.crossModalPairsStream(
      stream.toDF(), "doc_id", "modality")
    val query = out.writeStream.format("memory")
      .queryName("fp_pairs").outputMode("append").start()
    try {
      stream.addData(baseFps: _*) // batch 1: the ingested corpus
      query.processAllAvailable()
      stream.addData(twinFps: _*) // batch 2: planted twins arrive
      query.processAllAvailable()
    } finally query.stop()

    // at-least-once per pair -> compare as SETS (multi-band re-emits)
    val streamed = spark.table("fp_pairs")
      .select("modality", "new_id", "old_id", "hamming")
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = Dedup.crossModalNearDupPairs(
        baseFps.toDF(), twinFps.toDF(), "doc_id", "modality")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"extra=${streamed -- batch}, missing=${batch -- streamed}")
    // the planted structure: every twin found at Hamming exactly 1,
    // in ITS modality only
    assert(batch.size == 20)
    batch.foreach { case (_, nid, oid, ham) =>
      assert(oid == nid - 120L && ham == 1L)
    }
  }

  test("same-id re-delivery is idempotent; bucket cap bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 5 identical signatures in one modality, cap 3: only the first 3
    // enter state, but overflow arrivals (4, 5) still Hamming-check
    // against the stored 3 -> pairs among 1-3 plus overflow-vs-stored;
    // only the overflow-vs-overflow pair (5,4) is lost to the cap.
    // Re-sending: stored ids (1-3) add nothing (same-id idempotence);
    // overflow ids (4, 5) RE-EMIT their pairs — they are not in state,
    // so redelivery duplicates are the documented at-least-once cost,
    // collapsed by the distinct() below exactly like per-band re-emits.
    val sig = "01" * 32
    val fps = (1L to 5L).map(i => Fp("image", i, sig))
    val stream = MemoryStream[Fp]
    val out = StreamingFingerprints.crossModalPairsStream(
      stream.toDF(), "doc_id", "modality", maxPerBucket = 3)
    val query = out.writeStream.format("memory")
      .queryName("fp_cap").outputMode("append").start()
    try {
      stream.addData(fps: _*)
      query.processAllAvailable()
      stream.addData(fps: _*) // replay the same items
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("fp_cap")
      .select("new_id", "old_id").distinct()
      .as[(Long, Long)].collect().toSet
    val stored = Set((2L, 1L), (3L, 1L), (3L, 2L))
    val overflowVsStored =
      for (n <- Set(4L, 5L); o <- Set(1L, 2L, 3L)) yield (n, o)
    assert(got == stored ++ overflowVsStored,
      s"got $got — cap at 3 stores ids 1-3 (pairs among themselves), " +
        "4 and 5 still pair against the stored 3; (5,4) is lost")
  }
}
