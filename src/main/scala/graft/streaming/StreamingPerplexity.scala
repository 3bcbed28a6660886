package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ranking

/** Ingest-time perplexity gating over a document STREAM — the
  * streaming twin of the batch q182/q183 reference-LM bucket path, in
  * the shape a production ingest runs: every micro-batch is scored
  * under the STORED reference LM ([[Ranking.readRefLm]]) and labeled
  * head/middle/tail against the STORED cutoff values
  * ([[Ranking.readRefLmCutoffs]]), never against tertiles of the
  * batch itself — a micro-batch is a biased sample, so its own order
  * statistics would drift gate semantics batch to batch. Both
  * artifacts are measurements owned by the batch pipeline: retrain
  * the LM or re-measure the cutoffs and the stream re-tunes at its
  * next micro-batch with no code change.
  *
  * Why `foreachBatch` and not a streaming aggregation: scoring needs
  * a per-doc bigram groupBy plus three model joins per batch —
  * `foreachBatch` gives each micro-batch the full batch planner (the
  * [[StreamingCuration]] rationale), and the model tables are static
  * parquet the batch plan joins as ordinary relations (AQE broadcasts
  * the vocabulary-sized sides when it measures small).
  *
  * Delivery semantics: the decisions output is an append log,
  * at-least-once under replay — a crashed batch re-emits its rows
  * with the same (batch_id, id); downstream consumers dedup on that
  * key. Re-reading the artifacts per batch (one plan build + a 1-row
  * collect) is what makes the live re-tune real.
  */
object StreamingPerplexity {

  /** Score and label one micro-batch; append
    * (id, n_bigrams, logprob, bucket, batch_id) to `decisionsDir`.
    * Exposed for direct use and testing — [[start]]'s `foreachBatch`
    * calls exactly this.
    */
  def gateBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      modelPath: String,
      cutoffsPath: String,
      decisionsDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val model = Ranking.readRefLm(spark, modelPath)
    val (vHead, vMid) = Ranking.readRefLmCutoffs(spark, cutoffsPath)
    Ranking.refLmScore(batch, idCol, textCol, model)
      .withColumn("bucket",
        when(col("logprob") >= vHead, lit("head"))
          .when(col("logprob") >= vMid, lit("middle"))
          .otherwise(lit("tail")))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(decisionsDir)
  }

  /** Start the streaming gate: `docs` is a streaming frame carrying
    * `idCol` + `textCol`; every micro-batch flows through
    * [[gateBatch]]. `checkpointDir` makes replay semantics real
    * across restarts.
    */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      modelPath: String,
      cutoffsPath: String,
      decisionsDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, idCol, textCol, modelPath, cutoffsPath,
          decisionsDir, batchId)
      }
      .start()
}
