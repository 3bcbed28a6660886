package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingDedup

final case class Doc(doc_id: Long, text: String)

/** Round-4 extension: streaming MinHash-LSH near-dup probe — the
  * ingest-time twin of the batch candidate pipeline (q22).
  */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val base =
    "the quick brown fox jumps over the lazy dog and keeps on running far away"
  private val docs = Seq(
    Doc(1L, base),
    Doc(2L, base),                                  // exact dup of 1
    Doc(3L, base.replace("lazy", "noisy")),         // near-dup of 1/2
    Doc(4L, "completely unrelated text with zero overlapping shingles anywhere at all"),
    Doc(5L, base + " with a small extra tail"))     // near-dup, second batch

  test("row-level signatures equal the aggregate-path signatures") {
    import spark.implicits._
    val df = docs.toDF()
    val agg = Dedup.minhashSignatures(df, "doc_id", "text", k = 9)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val row = Dedup.rowMinhashSignatures(df, "doc_id", "text", k = 9)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(row == agg)
  }

  test("streaming candidates across batches match the batch LSH pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Doc]
    val out = StreamingDedup.lshCandidatePairsStream(
      stream.toDF(), "doc_id", "text")
    val query = out.writeStream.format("memory")
      .queryName("stream_pairs").outputMode("append").start()
    try {
      stream.addData(docs.take(4): _*) // batch 1: docs 1-4
      query.processAllAvailable()
      stream.addData(docs.drop(4): _*) // batch 2: doc 5 arrives later
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("stream_pairs")
      .as[(Long, Long)].collect().toSet
    val batch = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(docs.toDF(), "doc_id", "text", k = 9),
        "doc_id", k = 9, bands = 3)
      .as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    // assert the boundary properties on the STREAM's own output, so
    // they keep holding even if the equality above is ever relaxed
    assert(streamed.contains((1L, 2L))) // the exact dup must surface
    assert(!streamed.exists(p => p._1 == 4L || p._2 == 4L))
    // doc 5 paired across the batch boundary, via bucket state
    assert(streamed.exists(p => p._2 == 5L))
  }

  test("hot-bucket cap stops state growth, not the query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val same = (1L to 6L).map(i => Doc(i, base))
    val stream = MemoryStream[Doc]
    val out = StreamingDedup.lshCandidatePairsStream(
      stream.toDF(), "doc_id", "text", maxPerBucket = 3)
    val query = out.writeStream.format("memory")
      .queryName("capped_pairs").outputMode("append").start()
    try {
      stream.addData(same: _*)
      query.processAllAvailable()
    } finally query.stop()
    val pairs = spark.table("capped_pairs").as[(Long, Long)].collect().toSet
    // only the first 3 ids per bucket participate: pairs among {1,2,3}
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
