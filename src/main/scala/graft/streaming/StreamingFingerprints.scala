package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Online cross-modal near-dup detection over a FINGERPRINT stream —
  * the streaming twin of [[graft.operators.Dedup.crossModalNearDupPairs]]
  * (q166), for ingest-time dedup of a multimodal corpus: every arriving
  * item (text simhash64, image grid hash, audio energy hash, video
  * majority hash — any producer of the 64-char `simhash` convention)
  * is checked against everything already ingested IN ITS MODALITY,
  * continuously, without re-scanning state.
  *
  * Shape mirrors [[StreamingDedup]]'s band-bucket state, upgraded two
  * ways the batch rework proved out:
  *
  *  - signatures decode ONCE, statelessly, into two 32-bit integer
  *    words plus 4 band chunks — state stores and compares longs,
  *    never 64-char strings;
  *  - the Hamming check runs IN-STATE (`bitCount(xor)` against each
  *    stored word pair), so the stream emits verified
  *    `(modality, new_id, old_id, hamming)` pairs directly, not
  *    candidates needing a downstream verify.
  *
  * The state key is `(modality, band, chunk)` — the pigeonhole
  * guarantee is per modality, exactly the batch equi-key, so items of
  * different modalities can never meet. State per bucket is capped at
  * `maxPerBucket` (id, words) entries; a degenerate bucket stops
  * growing instead of OOMing the store. Items arriving past the cap
  * are still Hamming-checked against the stored entries (that scan is
  * bounded by the cap) — only their INSERT is skipped, so the lossage
  * is limited to overflow-vs-overflow pairs. The flip side of not
  * storing overflow ids: the same-id idempotence guard only covers
  * STORED ids, so an overflow id re-delivered by an at-least-once
  * source re-emits its overflow-vs-stored pairs once per redelivery —
  * bounded by the source's redelivery count, and collapsed by the same
  * distinct compaction the per-band re-emits already require.
  * Delivery is at-least-once per pair
  * (pairs agreeing on several bands emit once per band) — route
  * through a distinct compaction before acting, like the batch path's
  * pre-`distinct` multiset.
  */
object StreamingFingerprints {

  /** @param sigs streaming frame carrying `modalityCol` (string),
    *   `idCol` (integral) and `simhash` (64-char bit string)
    */
  def crossModalPairsStream(
      sigs: DataFrame,
      idCol: String,
      modalityCol: String,
      maxHamming: Int = 3,
      maxPerBucket: Int = 64): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band blocking is only lossless for maxHamming <= 3, got $maxHamming")
    require(maxPerBucket > 1, "maxPerBucket must allow at least one pair")
    val spark = sigs.sparkSession
    import spark.implicits._
    val decoded = sigs.select(
        col(modalityCol).cast("string").as("m"),
        col(idCol).cast("long").as("id"),
        conv(substring(col("simhash"), 1, 32), 2, 10).cast("long").as("w0"),
        conv(substring(col("simhash"), 33, 32), 2, 10).cast("long").as("w1"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band"),
            conv(substring(col("simhash"), 1 + 16 * i, 16), 2, 10)
              .cast("long").as("chunk"))): _*)).as("b"))
      .select(col("m"), col("id"), col("w0"), col("w1"),
        col("b.band").as("band"), col("b.chunk").as("chunk"))
      .as[(String, Long, Long, Long, Int, Long)]
    decoded
      .groupByKey { case (m, _, _, _, band, chunk) => s"$m|$band|$chunk" }
      .flatMapGroupsWithState[Seq[(Long, Long, Long)], (String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val modality = key.takeWhile(_ != '|')
          var seen = state.getOption.getOrElse(Seq.empty[(Long, Long, Long)])
          val out = Seq.newBuilder[(String, Long, Long, Long)]
          // sorted for deterministic emission order within a batch
          rows.toSeq.sortBy(_._2).foreach { case (_, id, w0, w1, _, _) =>
            if (!seen.exists(_._1 == id)) {
              // The Hamming check against stored entries is cheap and
              // bounded (<= maxPerBucket xors), so it runs even when
              // the bucket is full — only the state INSERT is skipped
              // at the cap, so a full bucket loses overflow-vs-overflow
              // pairs but still reports overflow-vs-stored ones.
              seen.foreach { case (sid, s0, s1) =>
                val ham = java.lang.Long.bitCount(w0 ^ s0) +
                  java.lang.Long.bitCount(w1 ^ s1)
                if (ham <= maxHamming) out += ((modality, id, sid, ham.toLong))
              }
              if (seen.size < maxPerBucket) seen = seen :+ ((id, w0, w1))
            }
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF(modalityCol, "new_id", "old_id", "hamming")
  }
}
