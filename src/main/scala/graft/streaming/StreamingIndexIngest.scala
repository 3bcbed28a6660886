package graft.streaming

import org.apache.spark.sql.DataFrame

/** Ingest-time PQ encoding of an embedding stream — the streaming twin
  * of the frozen-codebook batch ingest (q165,
  * [[graft.operators.Similarity.pqEncodeCodes]]): new vectors arrive
  * continuously, each encodes against the STORED books (trained once,
  * never touched by ingest), and the output stream appends to the
  * index's codes table. Re-training per micro-batch is the
  * anti-pattern this exists to avoid — at 100 TB the books are a tiny
  * broadcast-shaped artifact and the codes table is the index.
  *
  * Shape: the encode is STATELESS (one fused `pq_codes` expression per
  * row, the codebook riding as a codegen reference object), so this is
  * a pure projection over the stream — no state store, no watermark,
  * no shuffle; every micro-batch costs exactly its own rows. Append
  * mode composes with any sink, and the emitted schema is
  * [[graft.operators.Similarity.pqEncodeCodes]]'s
  * `(nbr, __code_0..__code_{m-1})`, so the accumulated sink table
  * unions directly with batch-encoded state for
  * [[graft.operators.Similarity.pqSearchWithCodes]] — the exact q165
  * search path, fed by a stream.
  *
  * Codes are bit-identical to the batch encode (same expression, same
  * assignment/NaN/tie rules), so replaying a corpus through the stream
  * and encoding it in one batch produce byte-equal index state —
  * ingest idempotence reduces to sink-level dedup on `nbr`.
  */
object StreamingIndexIngest {

  /** @param vecs  streaming frame carrying `idCol` and `vecCol`
    *              (`array<float>` or `array<double>`)
    * @param books per-subspace frozen codebooks
    *              ([[graft.operators.Similarity.pqCodebooks]] output)
    * @param dims  full vector width; `books.size` must divide it
    */
  def encodeStream(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame =
    // pqEncodeCodes is a pure stateless projection, so it works on a
    // streaming frame as-is — ONE implementation of the encode
    // contract, batch and stream
    graft.operators.Similarity.pqEncodeCodes(vecs, idCol, vecCol, dims, books)

  /** The CELL-PROBED index's ingest twin: each streamed vector gets
    * its coarse IVF cell id (stateless nearest-stored-centroid
    * projection) AND its PQ codes in one pass, emitting the
    * `(nbr, cell, __code_0..)` schema that
    * [[graft.operators.Similarity.ivfPqSearchWithCellCodes]] reads —
    * so stream-ingested vectors are searchable through the cell-
    * probed path, not just the flat one. Like [[encodeStream]] this
    * is a pure projection (no state store, no watermark, no shuffle);
    * the stored centroids and frozen books ride as codegen reference
    * objects, and the output is bit-identical to the batch
    * [[graft.operators.Similarity.ivfPqEncodeCellCodes]] — the SAME
    * function, applied to a streaming frame.
    */
  def encodeCellStream(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      cents: Seq[(Long, Array[Double])],
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame =
    graft.operators.Similarity.ivfPqEncodeCellCodes(
      vecs, idCol, vecCol, dims, cents, books)

  /** Delete events → tombstone rows, the ingest-time twin of the
    * takedown path: a stateless projection normalizing any
    * delete-event stream to the single-column `nbr` shape that
    * [[graft.operators.Similarity.pqSearchWithTombstones]] (live-view
    * search) and [[graft.operators.Similarity.pqCompactIndex]]
    * (physical rewrite + tombstone clear) consume. The accumulated
    * sink table IS the index's tombstone state — searches over
    * stream-ingested codes exclude stream-ingested deletes by the
    * same one anti join as batch, and periodic compaction folds both
    * streams' accumulation (small files AND deletions) back into a
    * minimal codes table.
    */
  def tombstoneStream(deletes: DataFrame, idCol: String): DataFrame =
    deletes.select(org.apache.spark.sql.functions.col(idCol).as("nbr"))
}
