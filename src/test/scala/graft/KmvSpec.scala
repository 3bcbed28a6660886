package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** KMV sketch vocabulary overlap: exactness when k covers the union,
  * bounded-error estimation when the vocabulary dwarfs k.
  */
class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** One 3-gram per row: source s carries grams [lo, hi]. */
  private def src(s: String, lo: Int, hi: Int) =
    (lo to hi).map(i => (s, s"w${i}a w${i}b w${i}c"))

  test("k >= |union|: the sketch IS the vocabulary, jaccard exact") {
    val d = (src("a", 1, 30) ++ src("b", 21, 50)).toDF("source", "text")
    val out = TextAnalysis.vocabOverlapKmv(d, "source", "text", n = 3, k = 64)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(2) == r.getDouble(3), "kmv == exact when nothing is dropped")
    assert(r.getDouble(4) == 0.0)
    assert(r.getLong(6) == 50L, "exact union")
  }

  test("KmvSketch aggregate: partition-invariant (mergeable), sorted, bounded") {
    import org.apache.spark.sql.functions.col
    val hashes = (1L to 500L).map(i => (i * 2654435761L) % 4294967296L)
    def agg(parts: Int) = hashes.toDF("h").repartition(parts)
      .agg(graft.functions.KmvSketch.kmvHashes(col("h"), 32).as("arr"))
      .collect().head.getSeq[Long](0)
    val one = agg(1)
    assert(one == agg(13), "merge path must equal single-partition path")
    assert(one.length == 32 && one == one.sorted)
    assert(one == hashes.distinct.sorted.take(32),
      "the sketch IS the k smallest distinct hashes")
  }

  test("kmv_hashes is callable from SQL") {
    val spark0 = spark
    graft.functions.GraftFunctions.register(spark0)
    (1L to 100L).toDF("h").createOrReplaceTempView("kmv_in")
    val arr = spark0.sql("SELECT kmv_hashes(h, 5) AS a FROM kmv_in")
      .collect().head.getSeq[Long](0)
    assert(arr == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("distinctEstimateStream: exact below k, state accumulates across batches, hash matches engine convention") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, md5}
    import graft.streaming.{EventStreams, HHItem}
    implicit val sqlCtx = spark.sqlContext

    // JVM-side hashing in the stream must equal the relational path
    val items = (1 to 40).map(i => s"item$i")
    val viaSql = items.toDF("x")
      .select(graft.operators.Sampling.hexPrefixValue(md5(col("x"))))
      .collect().map(_.getLong(0)).sorted.take(8)

    val stream = MemoryStream[HHItem]
    val out = EventStreams.distinctEstimateStream(stream.toDS(), k = 8)
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      stream.addData(items.take(5).map(HHItem("a", _)): _*)
      q.processAllAvailable()
      val first = spark.table("kmv_stream")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(first.toSeq == Seq(("a", 5L, 5.0)), "below k: exact count")
      stream.addData(items.drop(5).map(HHItem("a", _)) ++
        items.take(3).map(HHItem("b", _)): _*)
      q.processAllAvailable()
      val last = spark.table("kmv_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (k0, rs) => k0 -> rs.last }
      assert(last("b") == (("b", 3L, 3.0)))
      val (_, n, est) = last("a")
      assert(n == 8L, "sketch saturates at k")
      // the stream rounds to 6 decimals, matching the q148 batch
      // aggregate's round(est, 6) — bit-identical stream/batch output
      val expected = BigDecimal(7L * 4294967296L / viaSql.last.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(est == expected,
        "estimate derives from the SAME kth hash the relational path computes, rounded like the batch twin")
      assert(est > 10 && est < 400, s"estimate $est implausible for true 40")
    } finally q.stop()
  }

  test("vocab >> k: estimate within KMV error bounds, fixed-size sketch") {
    // J = 100 shared / 300 union = 1/3; k = 64 -> sigma ~ 0.06
    val d = (src("a", 1, 200) ++ src("b", 101, 300)).toDF("source", "text")
    val out = TextAnalysis.vocabOverlapKmv(d, "source", "text", n = 3, k = 64)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(3) == math.rint(100.0 / 300.0 * 1e6) / 1e6)
    assert(r.getDouble(4) < 0.25, s"|kmv - exact| = ${r.getDouble(4)} too large")
    val estUnion = r.getDouble(5)
    assert(estUnion > 120 && estUnion < 700,
      s"union estimate $estUnion implausible for true 300")
  }
}
