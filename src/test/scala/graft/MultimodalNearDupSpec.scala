package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.Dedup

/** Audio and video fingerprints feed the modality-blind simhash64
  * Hamming join: planted twins land at distance exactly 1, everything
  * else stays far, and the hashes equal their closed forms.
  */
class MultimodalNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("audioEnergyHash of the grid fixture IS the md5 loud/quiet pattern") {
    val ids = (0L until 10L).toDF("id")
    val got = Multimodal
      .audioEnergyHash(Multimodal.audioGridFixtures(ids, "id", base = 120L), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 10)
    (0L until 10L).foreach { id =>
      val expect = (0 until 64)
        .map(w => if (Multimodal.audioGridBit(id, w) == 1) '1' else '0').mkString
      assert(got(id) == expect, s"clip $id hash != md5 pattern")
    }
  }

  test("planted audio twins: Hamming exactly 1 via the pigeonhole join, no cross pairs") {
    val base = (0L until 30L).toDF("id")
    val twins = (120L until 150L).toDF("id")
    def h(df: org.apache.spark.sql.DataFrame) = Multimodal.audioEnergyHash(
      Multimodal.audioGridFixtures(df, "id", base = 120L), "id")
    val pairs = Dedup.simhashIncrementalPairsFromSigs(
        h(base), h(twins), "id", maxHamming = 3, sigChars = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 30, s"expected 30 planted pairs, got ${pairs.length}")
    pairs.foreach { case (nid, oid, ham) =>
      assert(oid == nid - 120L && ham == 1L, s"unexpected pair ($nid,$oid,$ham)")
    }
  }

  test("majorityHash: bitwise majority with ties to 1, order-stable reassembly") {
    val sigs = Seq(
      (1L, "1" + "0" * 63),
      (1L, "1" + "0" * 62 + "1"),
      (1L, "0" + "0" * 62 + "1"),
      (1L, "0" + "0" * 63)) // bit 1: 2/4 tie -> 1; bit 64: 2/4 tie -> 1
      .toDF("id", "simhash")
    val got = Multimodal.majorityHash(sigs, "id").collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "1" + "0" * 62 + "1")
  }

  test("planted video twins: per-frame hash + majority -> Hamming exactly 1") {
    val ids = ((0L until 15L) ++ (120L until 135L)).toDF("id")
    val (nFrames, everyMs) = (8, 250L)
    val span = nFrames * everyMs
    val frames = Multimodal.videoNearDupFixtures(ids, "id", base = 120L,
      nFrames, everyMs)
    val perFrame = Multimodal.imageGridHash(
        frames.select((col("id") * span + col("frame_ms")).as("fk"), col("bytes")),
        "fk")
      .select(expr(s"fk div ${span}L").as("id"), col("simhash"))
    val sigs = Multimodal.majorityHash(perFrame, "id")
    val pairs = Dedup.simhashIncrementalPairsFromSigs(
        sigs.filter(col("id") < 120), sigs.filter(col("id") >= 120),
        "id", maxHamming = 3, sigChars = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 15, s"expected 15 planted pairs, got ${pairs.length}")
    pairs.foreach { case (nid, oid, ham) =>
      assert(oid == nid - 120L && ham == 1L, s"unexpected pair ($nid,$oid,$ham)")
    }
  }

  test("crossModalNearDupPairs: identical signatures in different modalities never pair") {
    val sig = "01" * 32
    val near = "10" + "01" * 31 // hamming 2 from sig
    val far = "1" * 64
    val base = Seq(
      ("text", 1L, sig), ("image", 2L, sig), ("audio", 3L, far))
      .toDF("modality", "id", "simhash")
    val inc = Seq(
      ("text", 11L, near),  // pairs with text/1 only
      ("image", 12L, sig),  // pairs with image/2 only (hamming 0)
      ("audio", 13L, sig))  // audio base is far -> no pair
      .toDF("modality", "id", "simhash")
    val got = Dedup.crossModalNearDupPairs(base, inc, "id", "modality")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("text", 11L, 1L, 2L), ("image", 12L, 2L, 0L)),
      s"got $got — modality must gate the band join")
  }

  test("randomized equivalence: one cross-modal join == union of per-modality joins") {
    val rnd = new scala.util.Random(23)
    def sig() = (1 to 64).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
    def flip(s: String, k: Int) = {
      val idx = rnd.shuffle((0 until 64).toList).take(k).toSet
      s.zipWithIndex.map { case (c, i) =>
        if (idx(i)) (if (c == '1') '0' else '1') else c }.mkString
    }
    val mods = Seq("text", "image", "audio", "video")
    // per modality: 20 base sigs, incoming = 8 perturbed twins
    // (hamming 0..3) + 6 fresh randoms
    val data = mods.map { m =>
      val base = (1L to 20L).map(i => (m, i, sig()))
      val inc = base.take(8).zipWithIndex.map { case ((_, i, s), k) =>
        (m, 100L + i, flip(s, k % 4)) } ++
        (200L until 206L).map(i => (m, i, sig()))
      (base, inc)
    }
    val baseDf = data.flatMap(_._1).toDF("modality", "id", "simhash")
    val incDf = data.flatMap(_._2).toDF("modality", "id", "simhash")
    val joint = Dedup.crossModalNearDupPairs(baseDf, incDf, "id", "modality")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val perMod = mods.flatMap { m =>
      Dedup.simhashIncrementalPairsFromSigs(
          baseDf.filter(col("modality") === m).select("id", "simhash"),
          incDf.filter(col("modality") === m).select("id", "simhash"),
          "id", maxHamming = 3, sigChars = 64)
        .collect()
        .map(r => (m, r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(joint == perMod,
      s"extra=${joint -- perMod}, missing=${perMod -- joint}")
    assert(perMod.size >= 4 * 6, "planted near pairs must be present per modality")
  }
}
