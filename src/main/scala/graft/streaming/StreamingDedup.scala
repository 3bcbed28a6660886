package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Online near-duplicate candidate detection over a DOCUMENT stream —
  * the streaming twin of the batch MinHash-LSH pipeline (q22), for
  * ingest-time dedup: each arriving document is checked against
  * everything already ingested, continuously, without re-scanning the
  * corpus.
  *
  * Shape: signatures are a stateless per-row projection
  * ([[Dedup.rowMinhashSignatures]] — array expressions, no stateful
  * agg), band buckets explode exactly as in batch
  * ([[Dedup.lshBuckets]]), and the ONLY streaming state is the
  * per-(band, bucket) id list: `flatMapGroupsWithState` emits a
  * candidate pair the moment a new document lands in a bucket that
  * already holds others. State per bucket is capped at `maxPerBucket`
  * ids — a degenerate hot bucket (boilerplate that hashes everything
  * together) stops growing instead of OOMing the state store, at the
  * documented cost of missing candidates past the cap.
  *
  * Delivery is at-least-once per PAIR: documents agreeing in several
  * bands emit the same pair from each — mirror of the batch path's
  * pre-`distinct` multiset. Route the output through exact dedup (or
  * a downstream distinct compaction) before acting on it.
  */
object StreamingDedup {

  /** @param docs streaming frame carrying `idCol` (integral) and `textCol` */
  def lshCandidatePairsStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 9,
      bands: Int = 3,
      maxPerBucket: Int = 64): DataFrame = {
    require(maxPerBucket > 1, "maxPerBucket must allow at least one pair")
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = Dedup.rowMinhashSignatures(docs, idCol, textCol, k)
    Dedup.lshBuckets(sigs, idCol, k, bands)
      .select(col("band").cast("int"), col("bucket"), col(idCol).cast("long"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, bucket, _) => s"$band:$bucket" }
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          var seen = state.getOption.getOrElse(Seq.empty[Long])
          val out = Seq.newBuilder[(Long, Long)]
          // sorted for a deterministic emission order within a batch
          rows.map(_._3).toSeq.distinct.sorted.foreach { id =>
            if (!seen.contains(id) && seen.size < maxPerBucket) {
              seen.foreach(s => out += ((math.min(id, s), math.max(id, s))))
              seen = seen :+ id
            }
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF("d1", "d2")
  }
}
