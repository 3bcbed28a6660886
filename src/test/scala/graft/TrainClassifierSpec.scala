package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityClassifier, TextAnalysis}

/** Training the hashed quality classifier: the bounded driver loop
  * learns weights that actually separate planted good/bad classes, and
  * the trained model round-trips into the serving paths
  * (scoreHashedWithWeights and the per-row scoreExpr).
  */
class TrainClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // planted two-vocabulary corpus: positives speak quality words,
  // negatives speak junk words, with a shared neutral background
  private val rnd = new scala.util.Random(11)
  private def doc(pos: Boolean): String = {
    val own = if (pos) Seq("signal", "quality", "insight") else Seq("junk", "spamspam", "noise")
    val shared = Seq("the", "a", "data", "row")
    (1 to 30).map { _ =>
      if (rnd.nextBoolean()) own(rnd.nextInt(own.size))
      else shared(rnd.nextInt(shared.size))
    }.mkString(" ")
  }
  private lazy val corpus = (0L until 200L)
    .map(i => (i, doc(i % 2 == 0), i % 2 == 0))
    .toDF("doc_id", "text", "is_good")

  test("trained weights separate the planted classes through the serving path") {
    val m = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 64, seed = "spec:",
      epochs = 4, lrNum = 50L, lrDen = 1L)
    assert(m.weightsMilli.size == 64)
    assert(m.weightsMilli.exists(_ != 0L), "training moved some weight")
    val scored = QualityClassifier
      .scoreHashedWithWeights(corpus, "doc_id", "text", m, "spec:", threshold = 0.0)
      .join(corpus.select("doc_id", "is_good"), "doc_id")
      .select(col("is_good"), col("score"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1))
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    val mid = (pos.sum / pos.size + neg.sum / neg.size) / 2
    assert(pos.sum / pos.size > neg.sum / neg.size,
      "positive class must score above negative on average")
    val acc = (pos.count(_ >= mid) + neg.count(_ < mid)).toDouble / scored.length
    assert(acc >= 0.95, s"midpoint-threshold accuracy $acc below 0.95")
  }

  test("zero epochs is the null model; training is deterministic across runs") {
    val z = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 16, seed = "spec:",
      epochs = 0, lrNum = 50L, lrDen = 1L)
    assert(z.weightsMilli.forall(_ == 0L) && z.biasMilli == 0L)
    val a = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 16, seed = "spec:",
      epochs = 2, lrNum = 50L, lrDen = 1L)
    val b = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 16, seed = "spec:",
      epochs = 2, lrNum = 50L, lrDen = 1L)
    assert(a == b, "bit-identical weights on replay")
  }

  test("trained vocabulary round-trips into the per-row scoreExpr filter") {
    // project the bucket weights back onto an explicit vocabulary:
    // each term's weight is its bucket's trained weight — scoreExpr
    // then scores EXACTLY like the hashed path on texts whose tokens
    // are all in the vocabulary (same buckets, same milli arithmetic)
    val m = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 64, seed = "spec:",
      epochs = 4, lrNum = 50L, lrDen = 1L)
    val vocab = Seq("signal", "quality", "insight", "junk", "spamspam",
      "noise", "the", "a", "data", "row")
    val bucketOf = corpus.sparkSession.range(1)
      .select(vocab.map(t => operators.Sampling
        .hexPrefixValue(md5(concat(lit("spec:"), lit(t)))).mod(64).as(t)): _*)
      .collect()(0)
    val weights = vocab.zipWithIndex.map { case (t, i) =>
      t -> m.weightsMilli(bucketOf.getLong(i).toInt)
    }
    val model = QualityClassifier.LinearModel(weights, m.biasMilli, threshold = 0.0)
    val viaExpr = corpus
      .select(col("doc_id"), QualityClassifier.scoreExpr(col("text"), model).as("score"))
    val viaHashed = QualityClassifier
      .scoreHashedWithWeights(corpus, "doc_id", "text", m, "spec:", threshold = 0.0)
      .select(col("doc_id"), col("score"))
    val joined = viaExpr.join(viaHashed.withColumnRenamed("score", "score2"), "doc_id")
      .filter(col("score") =!= col("score2")).count()
    assert(joined == 0L,
      "scoreExpr over the projected vocabulary equals the hashed serving path")
  }

  test("micro-unit gate: exact integer score equals the double path within one micro") {
    val m = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 64, seed = "spec:",
      epochs = 2, lrNum = 50L, lrDen = 1L)
    val micro = QualityClassifier
      .scoreHashedWithWeightsMicro(corpus, "doc_id", "text", m, "spec:",
        thresholdMicro = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dbl = QualityClassifier
      .scoreHashedWithWeights(corpus, "doc_id", "text", m, "spec:", threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(micro.keySet == dbl.keySet)
    micro.foreach { case (id, sm) =>
      assert(math.abs(sm - math.round(dbl(id) * 1e6)) <= 1,
        s"doc $id: micro $sm vs double ${dbl(id)} — paths diverged past a rounding ulp")
    }
    // the keep decision at threshold 0 agrees exactly (sign never sits
    // on a rounding boundary)
    val keepM = QualityClassifier
      .scoreHashedWithWeightsMicro(corpus, "doc_id", "text", m, "spec:", 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val keepD = QualityClassifier
      .scoreHashedWithWeights(corpus, "doc_id", "text", m, "spec:", 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(keepM == keepD)
  }

  private val linearVocab = Seq("signal", "quality", "insight",
    "junk", "spamspam", "noise", "the", "a", "data", "row")

  test("trainLinear: explicit-vocab weights separate the classes and carry sign structure") {
    val m = QualityClassifier.trainLinear(corpus, "doc_id", "text",
      label = col("is_good"), vocab = linearVocab,
      epochs = 4, lrNum = 50L, lrDen = 1L)
    assert(m.weightsMilli.map(_._1) == linearVocab,
      "weights come back in vocabulary order")
    val w = m.weightsMilli.toMap
    // the planted class vocabularies must train to opposite signs
    Seq("signal", "quality", "insight").foreach(t =>
      assert(w(t) > 0L, s"positive-class term $t trained to ${w(t)}"))
    Seq("junk", "spamspam", "noise").foreach(t =>
      assert(w(t) < 0L, s"negative-class term $t trained to ${w(t)}"))
    // round-trip into q141's serving path (scoreLinear consumes the
    // model shape directly)
    val scored = QualityClassifier.scoreLinear(corpus, "doc_id", "text",
        m.weightsMilli, m.biasMilli, threshold = 0.0)
      .join(corpus.select("doc_id", "is_good"), "doc_id")
      .collect().map(r => r.getAs[Boolean]("is_good") -> r.getAs[Double]("score"))
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    val mid = (pos.sum / pos.size + neg.sum / neg.size) / 2
    val acc = (pos.count(_ >= mid) + neg.count(_ < mid)).toDouble / scored.length
    assert(acc >= 0.95, s"midpoint-threshold accuracy $acc below 0.95")
  }

  test("trainLinear: deterministic replay, null model at zero epochs, bias sentinel guarded") {
    val z = QualityClassifier.trainLinear(corpus, "doc_id", "text",
      label = col("is_good"), vocab = linearVocab,
      epochs = 0, lrNum = 50L, lrDen = 1L)
    assert(z.weightsMilli.forall(_._2 == 0L) && z.biasMilli == 0L)
    val a = QualityClassifier.trainLinear(corpus, "doc_id", "text",
      label = col("is_good"), vocab = linearVocab,
      epochs = 2, lrNum = 50L, lrDen = 1L)
    val b = QualityClassifier.trainLinear(corpus, "doc_id", "text",
      label = col("is_good"), vocab = linearVocab,
      epochs = 2, lrNum = 50L, lrDen = 1L)
    assert(a == b, "bit-identical weights on replay")
    intercept[IllegalArgumentException] {
      QualityClassifier.trainLinear(corpus, "doc_id", "text",
        label = col("is_good"), vocab = linearVocab :+ "",
        epochs = 1, lrNum = 50L, lrDen = 1L)
    }
    // over-cap vocabulary fails fast with the named error pointing at
    // trainHashed, before any plan is built
    val big = (0 to QualityClassifier.MaxLinearVocab).map(i => s"t$i")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.trainLinear(corpus, "doc_id", "text",
        label = col("is_good"), vocab = big,
        epochs = 1, lrNum = 50L, lrDen = 1L)
    }
    assert(e.getMessage.contains("trainHashed"), e.getMessage)
  }

  test("held-out evaluation: closed-form counts at degenerate gates, exact counts at a real one") {
    // train on the first 150 docs, hold out the last 50 (25 per class)
    val train = corpus.filter(col("doc_id") < 150)
    val eval = corpus.filter(col("doc_id") >= 150)
    val m = QualityClassifier.trainHashed(train, "doc_id", "text",
      label = col("is_good"), buckets = 64, seed = "spec:",
      epochs = 4, lrNum = 50L, lrDen = 1L)
    def report(t: Long): (Long, Long, Long, Long, Long, Long, Long, Long) = {
      val r = QualityClassifier.evaluateHashedMicro(eval, "doc_id", "text",
        label = col("is_good"), m, "spec:", thresholdMicro = t).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))
    }
    // gate wide open: everything kept — counts are closed-form
    assert(report(Long.MinValue) ==
      ((50L, 25L, 25L, 0L, 0L, 500000L, 1000000L, 500000L)))
    // gate shut: nothing kept — precision/recall pin to the 0 rule
    assert(report(Long.MaxValue) ==
      ((50L, 0L, 0L, 25L, 25L, 0L, 0L, 500000L)))
    // a real threshold: counts equal an independent recomputation from
    // the serving-path scores, and the planted classes separate
    val t = 500000L
    val scored = QualityClassifier
      .scoreHashedWithWeightsMicro(eval, "doc_id", "text", m, "spec:", t)
      .join(eval.select(col("doc_id"), col("is_good")), "doc_id")
      .collect().map(r => (r.getAs[Boolean]("keep"), r.getAs[Boolean]("is_good")))
    val (tp, fp) = (scored.count(x => x._1 && x._2).toLong, scored.count(x => x._1 && !x._2).toLong)
    val (fn, tn) = (scored.count(x => !x._1 && x._2).toLong, scored.count(x => !x._1 && !x._2).toLong)
    val got = report(t)
    assert(got._2 == tp && got._3 == fp && got._4 == fn && got._5 == tn,
      s"report $got vs recount ($tp,$fp,$fn,$tn)")
    assert(got._8 == (tp + tn) * 1000000L / 50L, "accuracy_ppm arithmetic")
    assert(got._8 >= 900000L, s"held-out accuracy ${got._8} below 0.9 on planted classes")
  }

  test("trainLinear micro gate: integer score equals the double scoreLinear within one micro") {
    val m = QualityClassifier.trainLinear(corpus, "doc_id", "text",
      label = col("is_good"), vocab = linearVocab,
      epochs = 2, lrNum = 50L, lrDen = 1L)
    val micro = QualityClassifier
      .scoreLinearMicro(corpus, "doc_id", "text", m, thresholdMicro = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dbl = QualityClassifier
      .scoreLinear(corpus, "doc_id", "text", m.weightsMilli, m.biasMilli, 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(micro.keySet == dbl.keySet)
    micro.foreach { case (id, sm) =>
      assert(math.abs(sm - math.round(dbl(id) * 1e6)) <= 1,
        s"doc $id: micro $sm vs double ${dbl(id)}")
    }
  }

  test("gate-threshold sweep: closed-form confusion, F1, and is_best selection") {
    // all-equal weights make the hash bucket irrelevant:
    // score_micro = 1000·w + 1000·bias/dl, so document length alone
    // sets the score — 7000/4000/3000/2000 for these four docs
    val m = QualityClassifier.TrainedHashedModel(Seq.fill(8)(1L), biasMilli = 6L)
    val docs = Seq(
      (1L, "a", true),
      (2L, "a b", true),
      (3L, "a b c", false),
      (4L, "a b c d e f", false))
      .toDF("doc_id", "text", "is_good")
    val rows = QualityClassifier.gateThresholdSweepMicro(
        docs, "doc_id", "text", col("is_good"), m, "spec:", nCandidates = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9)))
      .toSeq
    // thresholds 2000 + (5000·i) div 4; F1 peaks at t=3250 (perfect
    // split); ties elsewhere at 666666 ppm
    assert(rows == Seq(
      (0L, 2000L, 2L, 2L, 0L, 0L, 500000L, 1000000L, 666666L, false),
      (1L, 3250L, 2L, 0L, 0L, 2L, 1000000L, 1000000L, 1000000L, true),
      (2L, 4500L, 1L, 0L, 1L, 2L, 1000000L, 500000L, 666666L, false),
      (3L, 5750L, 1L, 0L, 1L, 2L, 1000000L, 500000L, 666666L, false),
      (4L, 7000L, 1L, 0L, 1L, 2L, 1000000L, 500000L, 666666L, false)))
    assert(QualityClassifier.selectGateThresholdMicro(
      docs, "doc_id", "text", col("is_good"), m, "spec:", nCandidates = 4) == 3250L)
  }

  test("calibration report: closed-form bins, rates, and sign-split means") {
    val m = QualityClassifier.TrainedHashedModel(Seq.fill(8)(1L), biasMilli = 6L)
    // scores 7000/4000/3000/2000 (see the sweep case); 5 bins over
    // [2000, 7000]: lows 2000/3000/4000/5000/6000
    val docs = Seq(
      (1L, "a", true),
      (2L, "a b", true),
      (3L, "a b c", false),
      (4L, "a b c d e f", false))
      .toDF("doc_id", "text", "is_good")
    val rows = QualityClassifier.calibrationReportMicro(
        docs, "doc_id", "text", col("is_good"), m, "spec:", nBuckets = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(rows == Seq(
      (0L, 2000L, 1L, 0L, 0L, 2000L),
      (1L, 3000L, 1L, 0L, 0L, 3000L),
      (2L, 4000L, 1L, 1L, 1000000L, 4000L),
      (3L, 5000L, 0L, 0L, 0L, 0L),
      (4L, 6000L, 1L, 1L, 1000000L, 7000L)))
  }

  test("gate-threshold sweep: degenerate single-score range stays well-defined") {
    val m = QualityClassifier.TrainedHashedModel(Seq.fill(8)(1L), biasMilli = 6L)
    val docs = Seq((1L, "a b", true), (2L, "c d", false))
      .toDF("doc_id", "text", "is_good")
    val rows = QualityClassifier.gateThresholdSweepMicro(
        docs, "doc_id", "text", col("is_good"), m, "spec:", nCandidates = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(9)))
      .toSeq
    // both docs score 4000: every threshold equals mn and every row
    // reports the keep-everything confusion; best = loosest gate
    assert(rows == (0L to 4L).map(i => (i, 4000L, 1L, 1L, i == 0L)))
  }

  test("scoreHashedExprMicro equals the groupBy micro scorer bit-for-bit") {
    val m = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 64, seed = "spec:",
      epochs = 2, lrNum = 50L, lrDen = 1L)
    // include a zero-token doc: dl clamps to 1, score = bias-micro
    val docs = corpus.select("doc_id", "text")
      .unionByName(Seq((9999L, "   ")).toDF("doc_id", "text"))
    val viaGroupBy = QualityClassifier
      .scoreHashedWithWeightsMicro(docs, "doc_id", "text", m, "spec:", 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaExpr = docs.select(col("doc_id"),
        QualityClassifier.scoreHashedExprMicro(col("text"), m, "spec:").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaGroupBy,
      "the per-row expression scorer must be bit-identical to the groupBy path")
  }

  test("stored hashed model round-trips through the q162 report shape") {
    val m = QualityClassifier.trainHashed(corpus, "doc_id", "text",
      label = col("is_good"), buckets = 16, seed = "spec:",
      epochs = 2, lrNum = 50L, lrDen = 1L)
    val path = java.nio.file.Files
      .createTempDirectory("spec-model-art").resolve("model").toString
    QualityClassifier.writeHashedModel(spark, m, path)
    assert(QualityClassifier.readHashedModel(spark, path) == m,
      "stored model must read back bit-identical")
    // a gapped bucket range (partial write) fails with a named error,
    // never a silently shifted weight array
    val gapped = spark.read.parquet(path).filter(col("bucket") =!= 7L)
    gapped.coalesce(1).write.mode("overwrite").parquet(path + "2")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.readHashedModel(spark, path + "2")
    }
    assert(e.getMessage.contains("gapped bucket range"))
  }

  test("stored gate-selection artifact: write, re-derived read, and re-measure swap") {
    val m = QualityClassifier.TrainedHashedModel(Seq.fill(8)(1L), biasMilli = 6L)
    val docs = Seq(
      (1L, "a", true),
      (2L, "a b", true),
      (3L, "a b c", false),
      (4L, "a b c d e f", false))
      .toDF("doc_id", "text", "is_good")
    val sweep = QualityClassifier.gateThresholdSweepMicro(
      docs, "doc_id", "text", col("is_good"), m, "spec:", nCandidates = 4)
    val path = java.nio.file.Files
      .createTempDirectory("spec-gate-sweep").resolve("sweep").toString
    QualityClassifier.writeGateSelection(sweep, path)
    // the stored sweep selects what the inline selection selects
    assert(QualityClassifier.readSelectedGateMicro(spark, path) == 3250L)
    // the selection rule is RE-DERIVED from the stored rows, not read
    // from the frozen is_best flag: overwrite the artifact with a
    // re-measured sweep whose F1 peak moved (cand 3 now wins; the
    // stale is_best still points at cand 1) and the read follows the
    // measurements
    val remeasured = sweep.withColumn("f1_ppm",
      when(col("cand") === 3L, lit(2000000L)).otherwise(col("f1_ppm")))
    QualityClassifier.writeGateSelection(remeasured, path)
    assert(QualityClassifier.readSelectedGateMicro(spark, path) == 5750L,
      "re-measured sweep rows must change the selected gate; a frozen flag must not pin it")
  }
}
