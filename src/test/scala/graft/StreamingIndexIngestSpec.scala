package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.StreamingIndexIngest

final case class Vec(vec_id: Long, embedding: Seq[Double])

/** Streaming frozen-book PQ ingest: codes streamed across micro-batches
  * are byte-equal to one batch encode with the same books, and the
  * books themselves stay untouched — the q165 contract at ingest time.
  */
class StreamingIndexIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Same clustered corpus as PqSpec: 4 tight clusters of 10 in 8 dims. */
  private def corpus = {
    import spark.implicits._
    (0L until 40L).map { i =>
      val c = (i / 10).toInt
      val base = Array.fill(8)(0.05)
      base(c * 2) = 1.0
      base(c * 2 + 1) = 0.5
      base(7 - c) = base(7 - c) + (i % 10) * 0.01
      Vec(i, base.toSeq)
    }
  }

  test("streamed codes across micro-batches equal the batch encode; books frozen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus
    val batchDf = rows.toDF()
    val books = Similarity.pqCodebooks(batchDf, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    def ser(b: Seq[Seq[(Long, Array[Double])]]): String =
      b.map(_.map { case (cid, v) =>
        s"$cid:${v.map(java.lang.Double.doubleToLongBits).mkString(",")}"
      }.mkString(";")).mkString("|")
    val before = ser(books)

    val stream = MemoryStream[Vec]
    val out = StreamingIndexIngest.encodeStream(
      stream.toDF(), "vec_id", "embedding", dims = 8, books)
    val query = out.writeStream.format("memory")
      .queryName("pq_ingest").outputMode("append").start()
    try {
      stream.addData(rows.take(25): _*) // micro-batch 1: base corpus
      query.processAllAvailable()
      stream.addData(rows.drop(25): _*) // micro-batch 2: new arrivals
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("pq_ingest")
      .select("nbr", "__code_0", "__code_1")
      .collect().map(_.toSeq).toSet
    val batch = Similarity.pqEncodeCodes(batchDf, "vec_id", "embedding", 8, books)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"extra=${streamed -- batch}, missing=${batch -- streamed}")
    assert(streamed.size == 40)
    assert(ser(books) == before, "streaming ingest must not touch the books")
    // and the streamed state is searchable through the stored-codes
    // path, matching a whole-corpus search with the same books
    val codesDf = spark.table("pq_ingest").select(
      col("nbr"), col("__code_0"), col("__code_1"))
    val viaStream = Similarity.pqSearchWithCodes(
        batchDf.filter(col("vec_id") < 2), codesDf, batchDf,
        "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    val viaBatch = Similarity.pqTopKWithBooks(
        batchDf.filter(col("vec_id") < 2), batchDf,
        "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    assert(viaStream == viaBatch,
      "search over stream-accumulated codes equals the batch index")
  }

  test("streamed cell+code rows equal the batch two-layer encode and search cell-probed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus
    val batchDf = rows.toDF()
    // stored index artifacts train on the base fold (3 of every 4 ids,
    // all clusters represented); the stream ingests the fourth fold
    val base = batchDf.filter(col("vec_id") % 4 =!= 3)
    val cents = Similarity.kmeansCentroids(base, "vec_id", "embedding", k = 4, iters = 2)
    val books = Similarity.pqCodebooks(base, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val streamRows = rows.filter(_.vec_id % 4 == 3)

    val stream = MemoryStream[Vec]
    val out = StreamingIndexIngest.encodeCellStream(
      stream.toDF(), "vec_id", "embedding", dims = 8, cents, books)
    val query = out.writeStream.format("memory")
      .queryName("ivfpq_ingest").outputMode("append").start()
    try {
      stream.addData(streamRows.take(6): _*)
      query.processAllAvailable()
      stream.addData(streamRows.drop(6): _*)
      query.processAllAvailable()
    } finally query.stop()

    // byte-equal to the batch cell-assign + encode of the same rows
    val streamed = spark.table("ivfpq_ingest").collect().map(_.toSeq).toSet
    val batch = Similarity.ivfPqEncodeCellCodes(
        batchDf.filter(col("vec_id") % 4 === 3), "vec_id", "embedding",
        dims = 8, cents, books)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"extra=${streamed -- batch}, missing=${batch -- streamed}")
    assert(streamed.size == 10)

    // the accumulated sink unions with the batch-built base table and
    // stream-ingested vectors are FOUND through the cell-probed search:
    // each query id (2 mod 10 within its cluster) has a streamed row
    // (3 mod 10) as a true jitter-adjacent neighbor
    val baseCodes = Similarity.ivfPqEncodeCellCodes(
      base, "vec_id", "embedding", dims = 8, cents, books)
    val union = baseCodes.unionByName(spark.table("ivfpq_ingest"))
    val queries = batchDf.filter(col("vec_id") % 10 === 2)
    val got = Similarity.ivfPqSearchWithCellCodes(
        queries, union, batchDf, "vec_id", "embedding", dims = 8,
        cents, books, nProbe = 4, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    // equals the one-shot index over the full corpus (same artifacts)
    val oneShot = Similarity.ivfPqTopKWithIndex(
        queries, batchDf, "vec_id", "embedding", dims = 8,
        cents, books, nProbe = 4, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    assert(got == oneShot, "cell-probed search over streamed union diverged")
    assert(got.nonEmpty &&
      got.exists(r => r(2).asInstanceOf[Long] % 4 == 3L),
      "stream-ingested neighbors never surfaced")
  }

  test("stream-ingested tombstones exclude deletes from the live-view search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus
    val batchDf = rows.toDF()
    val books = Similarity.pqCodebooks(batchDf, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val codes = Similarity.pqEncodeCodes(batchDf, "vec_id", "embedding", 8, books)

    // delete events arrive as a stream (id + ignored payload columns);
    // the accumulated sink table is the index's tombstone state
    val delStream = MemoryStream[(Long, String)]
    val out = StreamingIndexIngest.tombstoneStream(
      delStream.toDF().toDF("vec_id", "reason"), "vec_id")
    val query = out.writeStream.format("memory")
      .queryName("pq_tombs").outputMode("append").start()
    try {
      delStream.addData(1L -> "takedown", 2L -> "takedown")
      query.processAllAvailable()
      delStream.addData(3L -> "dedup")
      query.processAllAvailable()
    } finally query.stop()

    val tombs = spark.table("pq_tombs")
    assert(tombs.columns.toSeq == Seq("nbr"))
    val live = Similarity.pqSearchWithTombstones(
        batchDf.filter(col("vec_id") === 0), codes, tombs, batchDf,
        "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
      .collect()
    assert(live.nonEmpty)
    assert(live.forall(r => !Set(1L, 2L, 3L).contains(r.getLong(2))),
      "a stream-tombstoned id surfaced in the live-view top-k")
    // equals the batch live view with the same tombstone set
    val batchView = Similarity.pqSearchWithTombstones(
        batchDf.filter(col("vec_id") === 0), codes,
        Seq(1L, 2L, 3L).toDF("vec_id"), batchDf,
        "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    assert(live.map(_.toSeq).toSet == batchView)
  }
}
