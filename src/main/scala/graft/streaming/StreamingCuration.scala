package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DocPipeline

/** Ingest-time corpus curation over a document STREAM — the streaming
  * twin of the batch-over-batches [[DocPipeline.curateIncrement]]
  * (q137), in the exact shape a production ingest runs: a
  * `foreachBatch` sink where every micro-batch is labeled against a
  * durable parquet STATE TABLE holding one `(id, fp, simhash)` row per
  * already-admitted document, and each batch's kept rows are appended
  * to that table before the next batch is judged.
  *
  * Why `foreachBatch` and not `flatMapGroupsWithState`: the decision
  * cascade needs three differently-keyed joins per batch (fingerprint
  * hash-join, SimHash pigeonhole band join, eval shingle containment
  * join). Group-state can hold ONE partitioning; re-expressing the
  * cascade as co-grouped state would force the corpus state through a
  * single key space and re-shuffle it per stage. `foreachBatch` gives
  * each micro-batch the full batch planner — every state comparison
  * stays the blocked equi-join the batch operator already audited —
  * while the parquet state table IS the production artifact (shared
  * with any concurrent batch backfill, inspectable, compactable).
  *
  * Delivery semantics: state admission is IDEMPOTENT under replay —
  * a crash between the state append and the checkpoint commit replays
  * the batch, and every previously-admitted doc then labels
  * `exact_dup_base` (its fingerprint is already in the state), so
  * nothing is admitted twice (the batch twin's CurateSpec replay
  * property). The DECISIONS output is correspondingly at-least-once:
  * a replayed batch re-emits its rows, with formerly-`kept` docs
  * relabeled `exact_dup_base` — downstream consumers dedup on
  * (batch_id, id) or read decisions as an append log.
  */
object StreamingCuration {

  /** Label one micro-batch against the parquet state table at
    * `stateDir`, append `(id, n_tokens, decision, batch_id)` rows to
    * `decisionsDir`, and append the kept docs' state rows to
    * `stateDir`. Exposed for direct use and testing — [[start]]'s
    * `foreachBatch` calls exactly this.
    */
  def curateBatch(
      batch: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      decisionsDir: String,
      batchId: Long,
      cfg: DocPipeline.Config = DocPipeline.Config(),
      maxHamming: Int = 3,
      contaminationThreshold: Double = 0.5,
      sigChars: Int = 64): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // empty-state schema derives from the batch itself, so id types
    // and the simhash width always agree with what curateState appends
    val state =
      if (fs.exists(new Path(stateDir)))
        spark.read.parquet(stateDir)
      else
        DocPipeline.curateState(batch.limit(0), idCol, textCol, sigChars)
    val cached = DocPipeline.curateIncrementCached(
      state, batch, evalDocs, idCol, textCol, cfg,
      maxHamming, contaminationThreshold, sigChars)
    // the decision frame is read twice (decisions append + kept-id
    // filter for the state append) — one materialization, not two
    val dec = cached.df
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      dec.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(decisionsDir)
      val keptDocs = batch.join(
        dec.filter(col("decision") === "kept").select(col(idCol)),
        Seq(idCol), "left_semi")
      DocPipeline.curateState(keptDocs, idCol, textCol, sigChars)
        .write.mode("append").parquet(stateDir)
    } finally {
      dec.unpersist(false)
      cached.unpersist()
    }
  }

  /** Start the streaming ingest: `docs` is a streaming frame carrying
    * `idCol` + `textCol`; every micro-batch flows through
    * [[curateBatch]]. `checkpointDir` makes batch replay (and the
    * idempotent-admission semantics above) real across restarts.
    */
  def start(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      stateDir: String,
      decisionsDir: String,
      checkpointDir: String,
      cfg: DocPipeline.Config = DocPipeline.Config(),
      maxHamming: Int = 3,
      contaminationThreshold: Double = 0.5,
      sigChars: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(batch, evalDocs, idCol, textCol, stateDir,
          decisionsDir, batchId, cfg, maxHamming, contaminationThreshold,
          sigChars)
      }
      .start()

  /** State-table maintenance: rewrite `stateDir` as `numFiles` parquet
    * files. Every [[curateBatch]] call appends one small file set to
    * the state, and every SUBSEQUENT batch re-reads and re-plans over
    * all of them — unbounded small-file accumulation is the
    * long-running stream's throughput cliff. Call this periodically
    * (e.g. from the driver between micro-batches, or a scheduled
    * maintenance job when the stream is the only state writer and is
    * paused/quiesced): the rewrite stages into a sibling directory and
    * swaps by rename, so a crash mid-compaction leaves either the old
    * or the new state — never a mix. NOT safe concurrently with an
    * in-flight [[curateBatch]] state append (the append could land in
    * the directory being replaced); quiesce first.
    */
  def compactState(
      spark: org.apache.spark.sql.SparkSession,
      stateDir: String,
      numFiles: Int = 1): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    // siblings via (parent, name): a trailing slash on stateDir would
    // otherwise make these CHILDREN of the directory being renamed
    // and the swap would always fail
    def sibling(suffix: String) = new Path(dir.getParent, dir.getName + suffix)
    val staged = sibling("__compacting")
    if (fs.exists(staged)) fs.delete(staged, true)
    spark.read.parquet(stateDir)
      .coalesce(numFiles)
      .write.parquet(staged.toString)
    val old = sibling("__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compactState: could not stage out $stateDir")
    if (!fs.rename(staged, dir)) {
      // restore the original state before failing — the swap is
      // all-or-nothing from the reader's perspective
      fs.rename(old, dir)
      throw new java.io.IOException(s"compactState: could not swap in $staged")
    }
    fs.delete(old, true)
  }
}
