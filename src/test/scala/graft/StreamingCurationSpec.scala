package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocPipeline
import graft.streaming.StreamingCuration

/** Streaming ingest-time curation: micro-batches labeled against the
  * durable parquet state table, kept rows admitted exactly once.
  */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // three pairwise-distant vocabularies: 16-bit SimHash at
  // maxHamming = 0 must not cross-match them
  private val textA = "first unique document alpha beta gamma delta epsilon zeta eta theta one"
  private val textB = "second entry wholly different words about rivers mountains valleys oceans deserts two"
  private val textC = "third treatise concerning musical harmony rhythm melody counterpoint cadence tempo three"

  test("two micro-batches: cross-batch dups caught via the state table; replay admits nothing twice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-curate").toString
    val (stateDir, decDir, ckDir) = (s"$dir/state", s"$dir/decisions", s"$dir/ck")
    val eval = Seq(Doc(9000L, "held out benchmark sentence nobody may train on ever"))
      .toDF()

    val stream = MemoryStream[Doc]
    val q = StreamingCuration.start(stream.toDF(), eval, "doc_id", "text",
      stateDir, decDir, ckDir, cfg = DocPipeline.Config(minTokens = 5),
      maxHamming = 0)
    try {
      stream.addData(
        Doc(1L, textA),
        Doc(2L, textB),
        Doc(3L, "tiny"))                    // quality fail
      q.processAllAvailable()
      stream.addData(
        Doc(4L, textA),          // dup of batch-1 doc 1
        Doc(5L, textC),
        Doc(6L, textC))          // in-batch dup of 5
      q.processAllAvailable()
    } finally q.stop()

    val dec = spark.read.parquet(decDir)
      .select("doc_id", "decision", "batch_id").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(dec(1L)._1 == "kept" && dec(2L)._1 == "kept")
    assert(dec(3L)._1 == "quality")
    assert(dec(4L) == (("exact_dup_base", 1L)), "batch-2 doc must hit batch-1 state")
    assert(dec(5L)._1 == "kept")
    assert(dec(6L)._1 == "exact_dup_batch")
    // state admits exactly the kept docs
    val state = spark.read.parquet(stateDir)
    assert(state.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))

    // replay the committed batch directly (the crash-after-state-append
    // case): every formerly-kept doc now labels exact_dup_base and the
    // state grows by nothing
    StreamingCuration.curateBatch(
      Seq(Doc(5L, textC)).toDF(), eval,
      "doc_id", "text", stateDir, decDir, batchId = 99L,
      cfg = DocPipeline.Config(minTokens = 5), maxHamming = 0)
    val replay = spark.read.parquet(decDir)
      .filter($"batch_id" === 99L).select("decision").as[String].collect()
    assert(replay.toSeq == Seq("exact_dup_base"))
    assert(spark.read.parquet(stateDir).count() == 3, "replay admits nothing twice")

    // compaction: the per-batch appends left multiple file sets;
    // compactState rewrites to one file with identical rows, and a
    // subsequent batch still reads/judges against the compacted state
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stateFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
      .count(_.getPath.getName.endsWith(".parquet"))
    val before = spark.read.parquet(stateDir)
      .collect().map(_.toString).sorted.toSeq
    assert(stateFiles() > 1, "multiple appends should have left multiple files")
    StreamingCuration.compactState(spark, stateDir, numFiles = 1)
    assert(stateFiles() == 1, "compacted to one file")
    assert(spark.read.parquet(stateDir)
      .collect().map(_.toString).sorted.toSeq == before,
      "compaction preserves every state row")
    StreamingCuration.curateBatch(
      Seq(Doc(7L, textA)).toDF(), eval,
      "doc_id", "text", stateDir, decDir, batchId = 100L,
      cfg = DocPipeline.Config(minTokens = 5), maxHamming = 0)
    val afterCompact = spark.read.parquet(decDir)
      .filter($"batch_id" === 100L).select("decision").as[String].collect()
    assert(afterCompact.toSeq == Seq("exact_dup_base"),
      "post-compaction batch still sees the admitted corpus")
  }

  test("model gate rides streaming ingest: gated docs label model_filtered") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream-curate-model").toString
    val (stateDir, decDir, ckDir) = (s"$dir/state", s"$dir/decisions", s"$dir/ck")
    val eval = Seq(Doc(9000L, "held out benchmark sentence nobody may train on ever"))
      .toDF()
    // negative weight on "junk", positive bias: the junk doc scores
    // below the gate, everything else above — q143's model shape
    val cfg = DocPipeline.Config(minTokens = 5,
      model = Some(graft.operators.QualityClassifier.LinearModel(
        Seq("junk" -> -1000000L), biasMilli = 100L, threshold = 0.0)))

    val stream = MemoryStream[Doc]
    val q = StreamingCuration.start(stream.toDF(), eval, "doc_id", "text",
      stateDir, decDir, ckDir, cfg = cfg, maxHamming = 0)
    try {
      stream.addData(
        Doc(1L, textA),
        Doc(2L, "junk junk junk spam words the model gate must reject here"))
      q.processAllAvailable()
    } finally q.stop()

    val dec = spark.read.parquet(decDir)
      .select("doc_id", "decision").as[(Long, String)].collect().toMap
    assert(dec(1L) == "kept")
    assert(dec(2L) == "model_filtered")
    // gated docs never enter the state table
    assert(spark.read.parquet(stateDir)
      .select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("hashed gate from the stored sweep rides streaming ingest; re-measuring re-gates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    import graft.operators.QualityClassifier
    val dir = Files.createTempDirectory("stream-curate-sweep").toString
    val (stateDir, decDir, path) = (s"$dir/state", s"$dir/decisions", s"$dir/sweep")
    val eval = Seq(Doc(9000L, "held out benchmark sentence nobody may train on ever"))
      .toDF()
    // score_micro = (6 + dl)·1000 / dl (the CurateSpec fixture):
    // 7000 at dl=1, 4000 at dl=2, 2000 at dl=6
    val m = QualityClassifier.TrainedHashedModel(Seq.fill(8)(1L), biasMilli = 6L)
    val labeled = Seq(
      (11L, "a", true), (12L, "a b", true),
      (13L, "a b c", false), (14L, "a b c d e f", false))
      .toDF("doc_id", "text", "is_good")
    val sweep = QualityClassifier.gateThresholdSweepMicro(
      labeled, "doc_id", "text", col("is_good"), m, "spec:", nCandidates = 4)
    // the batch runner: the gate is read from the stored artifact at
    // config-build time — identical code for both measurements
    def runBatch(batchId: Long, docs: Seq[Doc]): Map[Long, String] = {
      val cfg = DocPipeline.Config(minTokens = 1, hashedGate = Some(
        DocPipeline.HashedModelGate.fromStoredSweep(spark, path, m, "spec:")))
      StreamingCuration.curateBatch(docs.toDF(), eval, "doc_id", "text",
        stateDir, decDir, batchId, cfg = cfg, maxHamming = 0)
      spark.read.parquet(decDir).filter($"batch_id" === batchId)
        .select("doc_id", "decision").as[(Long, String)].collect().toMap
    }
    QualityClassifier.writeGateSelection(sweep, path)
    // measured gate 3250: the dl=2 doc passes, the dl=6 doc gates
    val d1 = runBatch(1L, Seq(Doc(1L, "b c"), Doc(2L, "d e f g h i")))
    assert(d1 == Map(1L -> "kept", 2L -> "model_filtered"))
    // re-measured sweep (F1 peak at cand 3 → gate 5750): a fresh dl=2
    // doc now gates through the SAME batch code
    QualityClassifier.writeGateSelection(sweep.withColumn("f1_ppm",
      when(col("cand") === 3L, lit(2000000L)).otherwise(col("f1_ppm"))), path)
    val d2 = runBatch(2L, Seq(Doc(3L, "x y")))
    assert(d2 == Map(3L -> "model_filtered"),
      "overwriting the stored sweep must re-gate streaming ingest with no code change")
  }
}
