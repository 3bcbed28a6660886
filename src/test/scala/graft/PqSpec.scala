package graft

import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Product quantization + ADC search: codebook shape, code range,
  * exact-rescore agreement with brute force, and recall on a
  * cluster-structured corpus.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** 40 vectors in 8 dims: four tight clusters of 10 around distinct
    * axis-aligned anchors (id div 10 picks the cluster, id%10 a tiny
    * deterministic jitter on one coordinate).
    */
  private def corpus = {
    import spark.implicits._
    (0L until 40L).map { i =>
      val c = (i / 10).toInt
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.5f
      base(7 - c) = base(7 - c) + (i % 10) * 0.01f
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codebooks: m books of <= ks centroids over the right slice width") {
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    assert(books.length == 2)
    books.foreach { b =>
      assert(b.nonEmpty && b.size <= 4)
      assert(b.forall(_._2.length == 4), "centroids live in the 4-dim subspace")
      assert(b.map(_._1) == b.map(_._1).sorted, "books are cid-sorted")
    }
  }

  test("IVF-PQ: cell probe + ADC returns same-cluster neighbors with exact rescored sims") {
    val q = corpus.filter(col("vec_id") < 4)
    val out = Similarity.ivfPqTopK(q, corpus, "vec_id", "embedding",
        dims = 8, m = 2, ks = 4, pqIters = 2,
        nCells = 4, ivfIters = 2, nProbe = 2, k = 3, refine = 3)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L)))
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      assert(math.abs(brute((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-12)
      assert(r.getLong(2) / 10 == r.getLong(0) / 10,
        s"query ${r.getLong(0)} pulled cross-cluster neighbor ${r.getLong(2)}")
    }
  }

  test("ADC top-k: exact sims match brute force; high recall on clustered data") {
    val q = corpus.filter(col("vec_id") < 4)
    val pq = Similarity.pqTopK(q, corpus, "vec_id", "embedding",
        dims = 8, m = 2, ks = 4, iters = 2, k = 3, refine = 3)
      .collect()
    assert(pq.map(r => (r.getLong(0), r.getLong(1))).toSet.size == pq.length)
    // every query gets exactly k=3 ranked rows
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L)))
    // the rescored sim IS the exact cosine: cross-check against brute force
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(brute(key) - r.getDouble(3)) < 1e-12,
        s"rescored sim must equal exact cosine for $key")
    }
    // recall@3: with 10 same-cluster neighbors per query and 4 clean
    // clusters, ADC must surface same-cluster vectors
    pq.foreach { r =>
      assert(r.getLong(2) / 10 == r.getLong(0) / 10,
        s"query ${r.getLong(0)} pulled cross-cluster neighbor ${r.getLong(2)}")
    }
  }

  test("frozen-codebook ingest: books byte-identical, batch-only encode, union searchable") {
    // split INSIDE cluster 3 (base sees 30-34, the batch brings
    // 35-39): frozen books must represent a cluster to route to it —
    // a wholly-novel cluster degrading under frozen books is expected
    // PQ behavior, not what this test probes
    val base = corpus.filter(col("vec_id") < 35)
    val inc = corpus.filter(col("vec_id") >= 35)
    val books = Similarity.pqCodebooks(base, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    def ser(b: Seq[Seq[(Long, Array[Double])]]): String =
      b.map(_.map { case (cid, v) =>
        s"$cid:${v.map(java.lang.Double.doubleToLongBits).mkString(",")}"
      }.mkString(";")).mkString("|")
    val before = ser(books)
    val stateCodes = Similarity.pqEncodeCodes(base, "vec_id", "embedding", 8, books)
    // ingest: the new batch encodes against the FROZEN books — no
    // training ran, so the books are bitwise untouched
    val incCodes = Similarity.pqEncodeCodes(inc, "vec_id", "embedding", 8, books)
    assert(incCodes.count() == 5 && stateCodes.count() == 35)
    assert(ser(books) == before, "ingest must not touch the codebooks")
    val hits = Similarity.pqSearchWithCodes(
        corpus.filter(col("vec_id") >= 35 && col("vec_id") < 37),
        stateCodes.unionByName(incCodes), corpus, "vec_id", "embedding",
        dims = 8, books, k = 3, refine = 3)
      .collect()
    assert(hits.groupBy(_.getLong(0)).keySet == Set(35L, 36L))
    // new-batch queries find their same-cluster neighbors, which can
    // come from BOTH the stored state and the new batch
    hits.foreach(r => assert(r.getLong(2) / 10 == 3L,
      s"query ${r.getLong(0)} pulled cross-cluster ${r.getLong(2)}"))
    // and the union search equals a from-scratch encode of everything
    // with the same books (codes are deterministic per vector)
    val full = Similarity.pqTopKWithBooks(
        corpus.filter(col("vec_id") >= 35 && col("vec_id") < 37),
        corpus, "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    assert(hits.map(_.toSeq).toSet == full,
      "incremental union equals whole-corpus encode under frozen books")
  }

  test("index stats: occupancy sums to the corpus, imbalance floors at 1e6 and detects skew") {
    import org.apache.spark.sql.functions._
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val codes = Similarity.pqEncodeCodes(corpus, "vec_id", "embedding", 8, books)
    val per = codes
      .select(posexplode(array(col("__code_0"), col("__code_1")))
        .as(Seq("subspace", "code")))
      .groupBy(col("subspace"), col("code")).agg(count(lit(1)).as("n"))
    val stats = per.groupBy(col("subspace"))
      .agg(count(lit(1)).as("n_cells"), sum("n").as("n_vecs"),
        max("n").as("max_cell"), sum(col("n") * col("n")).as("__sq"))
      .withColumn("imbalance_ppm",
        expr("(n_cells * __sq * 1000000) div (n_vecs * n_vecs)"))
      .collect()
    assert(stats.length == 2)
    stats.foreach { r =>
      val (cells, vecs, maxC, imb) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getAs[Long]("imbalance_ppm"))
      assert(vecs == 40L, "every vector encodes in every subspace")
      assert(cells >= 1L && cells <= 4L && maxC <= vecs)
      // Cauchy-Schwarz: cells * sum(n^2) >= (sum n)^2, so the exact
      // integral ppm never floors below 1e6
      assert(imb >= 1000000L, s"imbalance_ppm $imb below the CS floor")
    }
    // planted perfect balance: 4 cells x 10 vectors -> exactly 1e6;
    // planted skew (37/1/1/1) -> cells*sq ppm way above it
    def ppm(ns: Seq[Long]): Long = {
      val (c, t, sq) = (ns.size.toLong, ns.sum, ns.map(n => n * n).sum)
      c * sq * 1000000L / (t * t)
    }
    assert(ppm(Seq(10L, 10L, 10L, 10L)) == 1000000L)
    assert(ppm(Seq(37L, 1L, 1L, 1L)) > 3000000L)
  }

  test("tombstones: deleted ids never surface, survivors fill the top-k, books untouched") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val snapshot = books.map(_.map { case (c, v) => (c, v.toSeq) })
    val codes = Similarity.pqEncodeCodes(corpus, "vec_id", "embedding", 8, books)
    val q = corpus.filter(col("vec_id") < 4)
    val deleted = Set(1L, 2L, 3L, 11L)
    val tombs = deleted.toSeq.toDF("vec_id")
    val out = Similarity.pqSearchWithTombstones(q, codes, tombs, corpus,
        "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !deleted.contains(r.getLong(2))),
      "a tombstoned id surfaced in the top-k")
    // query 0 lost its three nearest same-cluster ids (1,2,3) — the
    // surviving cluster members 4..9 must fill all three ranks
    val q0 = out.filter(_.getLong(0) == 0L).map(_.getLong(2)).toSet
    assert(q0.size == 3 && q0.subsetOf((4L to 9L).toSet),
      s"survivors did not fill query 0's top-k: $q0")
    assert(books.map(_.map { case (c, v) => (c, v.toSeq) }) == snapshot,
      "deletion must not touch the frozen books")
  }

  test("IVF-PQ tombstones: deleted ids never surface through the cell-probed path") {
    import spark.implicits._
    val q = corpus.filter(col("vec_id") < 4)
    val deleted = Set(1L, 2L, 3L, 11L)
    val out = Similarity.ivfPqTopKWithTombstones(q, corpus,
        deleted.toSeq.toDF("vec_id"), "vec_id", "embedding", dims = 8,
        cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 4, iters = 2),
        books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
          dims = 8, m = 2, ks = 4, iters = 2),
        // probe EVERY cell: with nProbe < nCells a query whose probed
        // cells held only deleted members legitimately returns empty
        // (IVF recall, not delete semantics) — full probing isolates
        // the tombstone contract under test
        nProbe = 4, k = 3, refine = 3)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !deleted.contains(r.getLong(2))),
      "a tombstoned id surfaced through the IVF-PQ path")
    // query 0's cluster-mates 1,2,3 are gone — survivors 4..9 fill
    val q0 = out.filter(_.getLong(0) == 0L).map(_.getLong(2)).toSet
    assert(q0.nonEmpty && q0.subsetOf((4L to 9L).toSet), s"unexpected fill: $q0")
  }

  test("compaction: stage-and-rename rewrite is idempotent and search-equivalent") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val codes = Similarity.pqEncodeCodes(corpus, "vec_id", "embedding", 8, books)
    val tmp = java.nio.file.Files.createTempDirectory("pqidx").toString
    val codesDir = s"$tmp/codes"
    val tombsDir = s"$tmp/tombs"
    codes.write.parquet(codesDir)
    val deleted = Seq(1L, 2L, 11L, 25L)
    deleted.toDF("vec_id").write.parquet(tombsDir)
    val q = corpus.filter(col("vec_id") < 4)
    def search(): Seq[(Long, Long, Long)] =
      Similarity.pqSearchWithCodes(q,
          Similarity.pqApplyTombstones(
            spark.read.parquet(codesDir),
            if (new java.io.File(tombsDir).exists)
              spark.read.parquet(tombsDir)
            else Seq.empty[Long].toDF("vec_id")),
          corpus, "vec_id", "embedding", dims = 8, books, k = 3, refine = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val pre = search()
    val n1 = Similarity.pqCompactIndex(spark, codesDir, tombsDir)
    assert(n1 == 40L - deleted.size, "compacted live count")
    assert(!new java.io.File(tombsDir).exists, "applied tombstones cleared")
    assert(search() == pre, "search differs across physical compaction")
    // idempotent: a second compaction (no tombstones left) is a no-op rewrite
    val n2 = Similarity.pqCompactIndex(spark, codesDir, tombsDir)
    assert(n2 == n1 && search() == pre, "re-compaction changed the index")
  }

  /** 3 planted clusters (ids interleaved, 10 each) all captured by one
    * fat centroid + 1 cluster under its own: occupancy (30, 10).
    */
  private def skewCorpus = {
    import spark.implicits._
    ((0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array.fill(8)(0.05f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.5f
      base(7 - c) = base(7 - c) + (i / 3 % 10) * 0.01f
      (i, base.toSeq)
    } ++ (30L until 40L).map { i =>
      val base = Array.fill(8)(0.05f)
      base(6) = 1.0f
      base(7) = 0.5f
      base(4) = base(4) + (i % 10) * 0.01f
      (i, base.toSeq)
    }).toDF("vec_id", "embedding")
  }
  private val skewCents = Seq(
    0L -> Array(1.0, 0.5, 1.0, 0.5, 1.0, 0.5, 0.05, 0.05),
    1L -> Array(0.05, 0.05, 0.05, 0.05, 0.05, 0.05, 1.0, 0.5))

  test("hot-cell split: planted skew rebalances, cold cell untouched, recall preserved") {
    val skew = skewCorpus
    val cents = skewCents
    def ppm(ns: Seq[Long]): Long = {
      val (c, t, sq) = (ns.size.toLong, ns.sum, ns.map(n => n * n).sum)
      c * sq * 1000000L / (t * t)
    }
    val split = Similarity.ivfSplitHotCells(skew, "vec_id", "embedding", cents,
      hotPpm = 1400000L, kSplit = 3, iters = 3)
    assert(split.hotCells == Seq(0L), "only the fat cell is hot")
    assert(split.cents.map(_._1) == Seq(0L, 1L, 2L, 3L), "relabeled cid*kSplit + sub")
    // the cold cell's centroid vector must be bit-identical, only relabeled
    assert(split.cents.find(_._1 == 3L).get._2.toSeq == cents(1)._2.toSeq,
      "cold centroid was touched")
    val occ = split.assignment.groupBy("cluster").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(occ.keySet == Set(0L, 1L, 2L, 3L))
    // before (30,10) -> after four cells of 10: imbalance 1.25e6 -> 1e6
    assert(occ.values.toSeq.sorted == Seq(10L, 10L, 10L, 10L), s"occupancy: $occ")
    assert(ppm(Seq(30L, 10L)) == 1250000L && ppm(occ.values.toSeq) == 1000000L,
      "planted imbalance did not drop to the balanced floor")
    // cluster div kSplit recovers the pre-split cell
    val pre = split.assignment
      .groupBy(expr("cluster div 3").as("cell")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pre == Map(0L -> 30L, 1L -> 10L))
    // recall through the cell-probed search is preserved at nProbe=1:
    // the planted clusters land one-per-sub-cell, so every true
    // neighbor stays co-located with its query
    val books = Similarity.pqCodebooks(skew, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val q = skew.filter(col("vec_id") < 6)
    val gt = Similarity.bruteForceTopK(q, skew, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def hits(cs: Seq[(Long, Array[Double])]): Int =
      Similarity.ivfPqTopKWithIndex(q, skew, "vec_id", "embedding",
          dims = 8, cs, books, nProbe = 1, k = 3, refine = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).count(gt.contains)
    assert(hits(split.cents) == hits(cents),
      "split changed recall at equal probe width")
    split.release()
  }

  test("split commit: stored index adopts the split atomically; stream ingest lands in the new cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val skew = skewCorpus
    val books = Similarity.pqCodebooks(skew, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-commit").toString
    Similarity.ivfWriteIndex(spark, dir, skewCents,
      Similarity.ivfPqEncodeCellCodes(skew, "vec_id", "embedding",
        dims = 8, skewCents, books))

    val split = Similarity.ivfSplitHotCells(skew, "vec_id", "embedding",
      skewCents, hotPpm = 1400000L, kSplit = 3, iters = 3)
    val q = skew.filter(col("vec_id") < 6)
    val inMem = Similarity.ivfPqTopKWithIndex(q, skew, "vec_id", "embedding",
        dims = 8, split.cents, books, nProbe = 1, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    val committed = Similarity.ivfCommitSplit(spark, dir, split, "vec_id", kSplit = 3)
    split.release()

    // labeling: the cold cell keeps its stored id (its partition was
    // never touched), the hot cell's 3 sub-centroids take fresh ids
    // above the stored max — maxOld=1, so 2/3/4
    assert(committed.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(committed.find(_._1 == 1L).get._2.toSeq == skewCents(1)._2.toSeq,
      "cold centroid was touched by the commit")
    val reread = Similarity.ivfReadCentroids(spark, dir)
    assert(reread.map(_._1) == committed.map(_._1) &&
      reread.zip(committed).forall { case ((_, a), (_, b)) => a.toSeq == b.toSeq },
      "stored centroid table diverges from the committed set")

    // stored codes: the hot partition is gone, the fresh sub-cells
    // hold its 30 members (copied codes, never re-encoded), the cold
    // partition untouched
    val codes = spark.read.parquet(Similarity.ivfCodesDir(dir))
      .withColumn("cell", col("cell").cast("long"))
    val occ = codes.groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(occ == Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L), s"occupancy $occ")

    // search over the COMMITTED artifact equals the in-memory split
    // result (cell labels never reach the ranking)
    val fromStore = Similarity.ivfPqSearchWithCellCodes(q, codes, skew,
        "vec_id", "embedding", dims = 8, committed, books,
        nProbe = 1, k = 3, refine = 3)
      .collect().map(_.toSeq).toSet
    assert(fromStore == inMem,
      s"extra=${fromStore -- inMem}, missing=${inMem -- fromStore}")

    // re-running the same commit is a no-op (the already-committed
    // path: hot cells absent from the stored centroids)
    val again = Similarity.ivfSplitHotCells(skew, "vec_id", "embedding",
      skewCents, hotPpm = 1400000L, kSplit = 3, iters = 3)
    try {
      val second = Similarity.ivfCommitSplit(spark, dir, again, "vec_id", kSplit = 3)
      assert(second.map(_._1) == committed.map(_._1))
    } finally again.release()

    // streaming ingest against the committed centroids: a new vector
    // per planted hot cluster lands in a DISTINCT fresh sub-cell, a
    // cold-cluster vector still lands in the cold cell
    def mk(setup: Array[Double] => Unit): Seq[Double] = {
      val base = Array.fill(8)(0.05)
      setup(base)
      base.toSeq
    }
    val newRows = Seq(
      Vec(100L, mk { b => b(0) = 1.0; b(1) = 0.5 }),
      Vec(101L, mk { b => b(2) = 1.0; b(3) = 0.5 }),
      Vec(102L, mk { b => b(4) = 1.0; b(5) = 0.5 }),
      Vec(103L, mk { b => b(6) = 1.0; b(7) = 0.5 }))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Vec]
    val out = graft.streaming.StreamingIndexIngest.encodeCellStream(
      stream.toDF(), "vec_id", "embedding", dims = 8, committed, books)
    val sq = out.writeStream.format("memory")
      .queryName("commit_ingest").outputMode("append").start()
    try {
      stream.addData(newRows: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val landed = spark.table("commit_ingest").select("nbr", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(landed(103L) == 1L, s"cold vector rerouted: $landed")
    assert(Seq(100L, 101L, 102L).map(landed).toSet == Set(2L, 3L, 4L),
      s"hot-cluster vectors must land one-per-fresh-sub-cell: $landed")

    // the streamed rows append into the stored partitioned table and
    // are FOUND by the cell-probed search over the committed index
    spark.table("commit_ingest").write.mode("append")
      .partitionBy("cell").parquet(Similarity.ivfCodesDir(dir))
    val corpusAll = skew.unionByName(
      newRows.map(v => (v.vec_id, v.embedding.map(_.toFloat))).toDF("vec_id", "embedding"))
    val afterIngest = Similarity.ivfPqSearchWithCellCodes(
        skew.filter(col("vec_id") === 0L),
        spark.read.parquet(Similarity.ivfCodesDir(dir))
          .withColumn("cell", col("cell").cast("long")),
        corpusAll, "vec_id", "embedding", dims = 8, committed, books,
        // refine=4: the probed sub-cell holds 11 rows after ingest and
        // the planted jitter collapses to identical PQ codes, so the
        // nbr-ASC tie-break would drop the (high-id) streamed row from
        // a 9-candidate coarse cut before its exact rescore
        nProbe = 1, k = 3, refine = 4)
      .collect().map(r => r.getLong(2))
    assert(afterIngest.contains(100L),
      s"streamed vector 100 not surfaced from the committed index: ${afterIngest.toSeq}")
  }

  test("recall sweep: one row per probe width, equivalent to sweeping the search path") {
    import spark.implicits._
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 4, iters = 2)
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val q = corpus.filter(col("vec_id") < 8)
    val sweep = Similarity.ivfPqRecallSweep(q, corpus, "vec_id", "embedding",
        dims = 8, cents, books, nProbes = Seq(1, 2, 4), k = 3, refine = 3)
      .collect()
    assert(sweep.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L), "one ordered row per width")
    assert(sweep.forall(_.getLong(1) == 8L), "n_queries")
    assert(sweep.forall(_.getLong(3) == 24L), "possible = queries x k")
    val gt = Similarity.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // the sweep must report EXACTLY what sweeping the production search
    // path measures, width by width
    sweep.foreach { row =>
      val p = row.getLong(0).toInt
      val ann = Similarity.ivfPqTopKWithIndex(q, corpus, "vec_id", "embedding",
          dims = 8, cents, books, nProbe = p, k = 3, refine = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val hits = ann.count(gt.contains).toLong
      assert(row.getLong(2) == hits, s"nProbe=$p: sweep ${row.getLong(2)} != path $hits")
      assert(row.getLong(4) == hits * 1000000L / 24L, s"nProbe=$p recall_ppm")
    }
    // planted clusters + full probing: every true neighbor recovered
    assert(sweep.last.getLong(4) == 1000000L, "full probe on planted clusters")
  }

  test("compaction preserves tombstones appended after the read snapshot") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val codes = Similarity.pqEncodeCodes(corpus, "vec_id", "embedding", 8, books)
    val tmp = java.nio.file.Files.createTempDirectory("pqrace").toString
    val codesDir = s"$tmp/codes"
    val tombsDir = s"$tmp/tombs"
    codes.write.parquet(codesDir)
    Seq(1L, 2L).toDF("vec_id").write.parquet(tombsDir)
    // a writer appends tombstone 25 once compaction has passed its
    // snapshot point (the staged sibling appears strictly after the
    // tombstone file listing); if the window is missed the append
    // lands after compaction returns — the contract assertions below
    // hold either way, so the test cannot flake
    val staged = new java.io.File(s"$tmp/codes__compacting")
    @volatile var compacted = false
    val appender = new Thread(() => {
      while (!staged.exists && !compacted) Thread.sleep(1)
      Seq(25L).toDF("nbr").coalesce(1).write.mode("append").parquet(tombsDir)
    })
    appender.start()
    val n1 = Similarity.pqCompactIndex(spark, codesDir, tombsDir)
    compacted = true
    appender.join()
    assert(n1 == 38L, "snapshotted tombstones applied")
    // the late tombstone must SURVIVE (not be deleted unapplied) and
    // the live view must exclude it
    val tombsNow = spark.read.parquet(tombsDir)
      .collect().map(_.getLong(0)).toSet
    assert(tombsNow.contains(25L), "late tombstone was clobbered by compaction")
    val live = Similarity.pqApplyTombstones(
        spark.read.parquet(codesDir), spark.read.parquet(tombsDir))
      .select("nbr").collect().map(_.getLong(0)).toSet
    assert(!live.contains(25L) && live.size == 37,
      s"live view wrong after late tombstone: ${live.size}")
    // the next compaction cycle folds the late tombstone in physically
    val n2 = Similarity.pqCompactIndex(spark, codesDir, tombsDir)
    assert(n2 == 37L, "next cycle did not apply the late tombstone")
  }

  test("compaction self-heals the crash window where codesDir is staged out") {
    import spark.implicits._
    val books = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
      dims = 8, m = 2, ks = 4, iters = 2)
    val codes = Similarity.pqEncodeCodes(corpus, "vec_id", "embedding", 8, books)
    val tmp = java.nio.file.Files.createTempDirectory("pqheal").toString
    val codesDir = s"$tmp/codes"
    val tombsDir = s"$tmp/tombs"
    codes.write.parquet(codesDir)
    Seq(3L).toDF("vec_id").write.parquet(tombsDir)
    // simulate a crash between rename(dir -> __old) and
    // rename(staged -> dir): no codes table, intact __old sibling
    assert(new java.io.File(codesDir).renameTo(new java.io.File(s"$tmp/codes__old")))
    val n = Similarity.pqCompactIndex(spark, codesDir, tombsDir)
    assert(n == 39L, "restart did not restore __old and compact")
    assert(new java.io.File(codesDir).exists)
    assert(!new java.io.File(s"$tmp/codes__old").exists, "__old left behind")
    val ids = spark.read.parquet(codesDir).select("nbr")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(3L) && ids.size == 39)
  }
}
