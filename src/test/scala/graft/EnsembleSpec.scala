package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Blocker-ensemble near-dup: provenance flags reflect which geometry
  * surfaced each verified pair, and the union dominates any single
  * blocker.
  */
class EnsembleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  test("provenance: same-bucket twins hit all blockers; a first-char edit escapes SNM but not the hash blockers") {
    val docs = Seq(
      (1L, base),
      (2L, base + " nu"),        // near-identical, same SNM bucket
      (3L, "x" + base),          // first char differs -> different SNM bucket,
                                 // shingle set almost identical -> LSH finds it
      (4L, "completely unrelated content about rivers and mountains and oceans"))
      .toDF("doc_id", "text")
    val out = Dedup.ensembleNearDup(docs, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    val (_, lsh12, _, snm12) = out((1L, 2L))
    assert(lsh12 && snm12, "same-prefix twins must be found by LSH and SNM")
    assert(out.contains((1L, 3L)), "the shifted doc is still a verified near-dup")
    val (_, lsh13, _, snm13) = out((1L, 3L))
    assert(lsh13, "9 of 11 shingles shared -> LSH bands collide")
    assert(!snm13, "different first-4-char bucket: SNM cannot see this pair")
    assert(!out.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("union dominates: every LSH-verified pair appears with by_lsh set") {
    val docs = (0L until 30L).map { i =>
      if (i % 3 == 0) (i, base + s" tail$i")
      else (i, s"doc $i entirely distinct words w${i}a w${i}b w${i}c w${i}d w${i}e")
    }.toDF("doc_id", "text")
    val lshOnly = Dedup.jaccardNearDupPairs(docs, "doc_id", "text",
        k = 9, bands = 3, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ens = Dedup.ensembleNearDup(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    lshOnly.foreach { p =>
      assert(ens.get(p).contains(true), s"LSH pair $p missing or unflagged in ensemble")
    }
  }

  test("recall report: per-mask counts tally the verified set, shares sum to 1") {
    val docs = Seq(
      (1L, base),
      (2L, base + " nu"),
      (3L, "x" + base),
      (4L, "completely unrelated content about rivers and mountains and oceans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ensembleNearDup(docs, "doc_id", "text", threshold = 0.5)
      .collect()
    val report = Dedup.ensembleRecallReport(docs, "doc_id", "text", threshold = 0.5)
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        ((r.getLong(3), r.getDouble(4))))
      .toMap
    assert(report.values.map(_._1).sum == pairs.length,
      "mask counts partition the verified pair set")
    assert(math.abs(report.values.map(_._2).sum - 1.0) < 1e-5,
      "shares sum to 1")
    // the fixture's SNM-blind pair (1,3) must appear under a mask with
    // by_snm = false — the audit's whole point
    assert(report.keys.exists { case (_, _, snm) => !snm },
      "the SNM-blind mask combination is reported")
  }

  test("cached variant: recall-from-pairs over one computation equals the standalone report") {
    val docs = Seq(
      (1L, base),
      (2L, base + " nu"),
      (3L, "x" + base),
      (4L, "completely unrelated content about rivers and mountains and oceans"))
      .toDF("doc_id", "text")
    val cached = Dedup.ensembleNearDupCached(docs, "doc_id", "text", threshold = 0.5)
    try {
      val direct = Dedup.ensembleNearDup(docs, "doc_id", "text", threshold = 0.5)
        .collect().map(_.toSeq).toSet
      assert(cached.df.collect().map(_.toSeq).toSet == direct,
        "cached and one-shot pair sets agree")
      val fromPairs = Dedup.ensembleRecallFromPairs(cached.df)
        .collect().map(_.toSeq).toSet
      val standalone = Dedup.ensembleRecallReport(docs, "doc_id", "text", threshold = 0.5)
        .collect().map(_.toSeq).toSet
      assert(fromPairs == standalone,
        "recall audit from precomputed pairs matches the from-scratch report")
    } finally cached.unpersist()
  }
}
