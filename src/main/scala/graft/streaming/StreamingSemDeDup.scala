package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Ingest-time SEMANTIC dedup of an embedding stream — the streaming
  * twin of the batch SemDeDup pair (q193 full-corpus, q194 incremental
  * batch): every micro-batch dedups against the ADMITTED REPRESENTATIVE
  * set through the stored k-means index, its decisions append to a log,
  * and its kept vectors join the representative state. This is the
  * paper's (Abbas et al. 2023) one-representative-per-ε-ball rule run
  * continuously: the state holds KEPT vectors only, so a new vector
  * matching only a previously-DROPPED one is admitted — dropped
  * vectors never gate anything again.
  *
  * Scale shape ([[Similarity.semDeDupIncrementAssigned]]'s): the state
  * stores its cell assignment, so each batch assigns ONLY its own rows
  * (a stateless projection over the centroid literals — never a
  * re-assignment sweep of the grown state), and the pairwise cosine
  * runs only against same-cell representatives plus smaller-id
  * same-batch members — per-batch cost is |batch| × cell occupancy at
  * any corpus size, never state × state. At 100 TB, bucket the state
  * table by `cluster` so the per-cell join co-locates without a
  * shuffle; the representative set is the SMALL survivor fraction of
  * the corpus by construction.
  *
  * Delivery semantics (the [[StreamingCuration]] discipline): the
  * decisions output is an append log, at-least-once under replay —
  * consumers dedup on (batch_id, id), keeping the first write. State
  * admission is SELF-idempotent with no log: a re-delivered kept
  * vector meets its own admitted copy in the same cell at cosine 1.0
  * (assignment is deterministic), is labeled a drop, and is not
  * re-admitted — the state stays exactly-once for any threshold ≤ 1.
  * (For the same reason a replayed batch's re-emitted decisions flip
  * its kept rows to drops; the first-write rows are the true ones.)
  *
  * Why `foreachBatch`: the gate needs a join against a parquet state
  * table that GROWS with the stream — per-batch batch-planner work,
  * the curation rationale. State small-file accumulation is bounded by
  * periodic [[StreamingCuration.compactState]] over `stateDir` (same
  * staged-swap contract; quiesce the stream first).
  */
object StreamingSemDeDup {

  /** Gate one micro-batch: dedup against the representative state at
    * `stateDir`, append (id, cluster, nn_sim, keep, batch_id) to
    * `decisionsDir`, and admit the kept vectors' (id, vec, cluster)
    * rows into the state. The state carries its CELL ASSIGNMENT
    * ([[Similarity.semDeDupAssign]]'s shape), so assignment is paid
    * once per vector at admission — a micro-batch never re-assigns
    * the whole representative set, only its own rows. Exposed for
    * direct use and testing — [[start]]'s `foreachBatch` calls
    * exactly this.
    */
  def gateBatch(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      threshold: Double,
      stateDir: String,
      decisionsDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // empty-state schema derives from the batch itself, so the id and
    // vector types always agree with what the admission appends
    val state =
      if (fs.exists(new Path(stateDir))) spark.read.parquet(stateDir)
      else Similarity.semDeDupAssign(batch.limit(0), idCol, vecCol, cents)
    // persisted for the batch write: the decisions append and the
    // kept-id filter for the state admission both read `dec`
    val dec = Similarity.semDeDupIncrementAssigned(
        state, batch, idCol, vecCol, cents, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      dec.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(decisionsDir)
      // kept rows enter the state WITH the cluster dec already carries
      batch.select(col(idCol), col(vecCol))
        .join(dec.filter(col("keep")).select(col(idCol), col("cluster")),
          Seq(idCol))
        .write.mode("append").parquet(stateDir)
    } finally dec.unpersist(false)
  }

  /** Start the streaming semantic-dedup gate: `vecs` is a streaming
    * frame carrying `idCol` + `vecCol`; every micro-batch flows through
    * [[gateBatch]]. `checkpointDir` makes the replay semantics above
    * real across restarts.
    */
  def start(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Seq[(Long, Array[Double])],
      threshold: Double,
      stateDir: String,
      decisionsDir: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, idCol, vecCol, cents, threshold, stateDir,
          decisionsDir, batchId)
      }
      .start()
}
