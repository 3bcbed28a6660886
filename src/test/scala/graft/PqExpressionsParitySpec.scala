package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayDotProduct, PqExpressions}

/** Round-10 fused-expression contract, in two halves.
  *
  * 1. BIT-PARITY on well-formed inputs: for seeded pseudo-random
  *    vectors and books (all norms nonzero — including a SHORT vector,
  *    whose slices are merely shorter), `pq_codes` / `pq_lut` /
  *    `centroid_cosines` / `pq_train_assign` reproduce the dot-literal
  *    + comparator-struct trees they replaced EXACTLY (Double bit
  *    patterns, not approximate equality). This is the contract the
  *    nine ANN DuckDB oracles rest on.
  *
  * 2. DEGENERATE POLICY: on zero-norm inputs the literal trees never
  *    reached their own NaN guards at all — Spark 4's ANSI mode throws
  *    DIVIDE_BY_ZERO even for DOUBLE division, and legacy mode yields
  *    NULL, not NaN (both verified empirically here). The fused
  *    kernels compute in plain IEEE Java arithmetic, so the documented
  *    guard policies (encode: NaN never chosen; training: NaN chosen
  *    first — each matching its DuckDB oracle's NaN-under-DESC
  *    position) now actually apply. These tests pin that FIXED
  *    behavior directly.
  */
class PqExpressionsParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dims = 8
  private val m = 2
  private val sub = dims / m

  /** Deterministic LCG doubles in [-1, 1), nudged off zero. */
  private def rnd(seed: Long, n: Int): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val x = (s >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
      if (math.abs(x) < 1e-3) x + 0.5 else x
    }
  }

  private def books(seed: Long): Seq[Seq[(Long, Array[Double])]] =
    (0 until m).map { mi =>
      (0 until 4).map(j => (j.toLong, rnd(seed + mi * 97 + j, sub)))
    }

  /** well-formed corpus; id 1 is SHORT (5 of 8 dims) but nonzero */
  private def corpus(seed: Long) = {
    import spark.implicits._
    (0L until 30L).map { i =>
      val v =
        if (i == 1) rnd(seed + i, 5).toSeq
        else rnd(seed + i, dims).toSeq
      (i, v)
    }.toDF("id", "v")
  }

  private def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  // the pre-round-10 literal formulations, reconstructed verbatim
  private def literalCode(cv: Column, book: Seq[(Long, Array[Double])], mi: Int): Column = {
    val sv = slice(cv, mi * sub + 1, sub)
    val svn = sqrt(dot(sv, sv))
    val entries = book.zipWithIndex.map { case ((_, v), j) =>
      val cn = math.sqrt(v.map(x => x * x).sum)
      val negsim = dot(sv, typedLit(v.toSeq)) / (svn * lit(cn)) * -1.0
      struct(when(isnan(negsim), lit(Double.PositiveInfinity))
          .otherwise(negsim).as("n"),
        lit(j).as("j"))
    }
    array_min(array(entries: _*)).getField("j")
  }

  test("pq_codes == the slice+dot-literal array_min trees (incl. a short vector)") {
    for (seed <- Seq(11L, 222L, 3333L)) {
      val bs = books(seed)
      val df = corpus(seed)
      val fused = df.select(col("id"),
        PqExpressions.pqCodes(col("v"), bs, sub).as("c"))
        .select(col("id"), element_at(col("c"), 1).as("c0"),
          element_at(col("c"), 2).as("c1"))
      val lit0 = df.select(col("id"),
        literalCode(col("v"), bs(0), 0).as("c0"),
        literalCode(col("v"), bs(1), 1).as("c1"))
      val a = fused.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val b = lit0.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(a == b, s"seed $seed: fused=${a -- b} literal=${b -- a}")
    }
  }

  test("pq_lut == the slice dot-literal entries, bit-for-bit") {
    for (seed <- Seq(17L, 1234L)) {
      val bs = books(seed)
      val df = corpus(seed)
      val lutEntries = for (mi <- 0 until m; (_, v) <- bs(mi))
        yield dot(slice(col("v"), mi * sub + 1, sub), typedLit(v.toSeq))
      val both = df.select(col("id"),
          PqExpressions.pqLut(col("v"), bs, sub).as("f"),
          array(lutEntries: _*).as("l"))
        .collect()
      both.foreach { r =>
        val f = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
        val l = r.getSeq[Double](2).map(java.lang.Double.doubleToRawLongBits)
        assert(f == l, s"seed $seed id ${r.getLong(0)}: LUT bits differ")
      }
    }
  }

  test("centroid_cosines == the dot-literal cosine array, bit-for-bit") {
    for (seed <- Seq(29L, 555L)) {
      val cents = books(seed)(1)
      val df = corpus(seed)
        .select(col("id"), slice(col("v"), 1, sub).as("sv"))
        .withColumn("n", sqrt(dot(col("sv"), col("sv"))))
      val litArr = array(cents.map { case (_, v) =>
        val cn = math.sqrt(v.map(x => x * x).sum)
        dot(col("sv"), typedLit(v.toSeq)) / (col("n") * lit(cn))
      }: _*)
      val both = df.select(col("id"),
          PqExpressions.centroidCosines(col("sv"), col("n"), cents).as("f"),
          litArr.as("l"))
        .collect()
      both.foreach { r =>
        val f = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
        val l = r.getSeq[Double](2).map(java.lang.Double.doubleToRawLongBits)
        assert(f == l, s"seed $seed id ${r.getLong(0)}: cosine bits differ")
      }
    }
  }

  test("pq_train_assign == the byMi when-chain of array_min comparator trees") {
    for (seed <- Seq(43L, 777L)) {
      val bs = books(seed)
      val e = corpus(seed)
        .select(col("id"), explode(array((0 until m).map(mi =>
          struct(lit(mi).as("mi"),
            slice(col("v"), mi * sub + 1, sub).as("sv"))): _*)).as("s"))
        .select(col("id"), col("s.mi").as("mi"), col("s.sv").as("sv"))
        .withColumn("n", sqrt(dot(col("sv"), col("sv"))))
      def simsArr(book: Seq[(Long, Array[Double])]): Column =
        array(book.map { case (_, v) =>
          val cn = math.sqrt(v.map(x => x * x).sum)
          dot(col("sv"), typedLit(v.toSeq)) / (col("n") * lit(cn))
        }: _*)
      def bestCid(book: Seq[(Long, Array[Double])]): Column =
        array_min(array(book.zipWithIndex.map { case ((cid, _), i) =>
          val s = element_at(simsArr(book), i + 1)
          struct(
            when(isnan(s), lit(Double.NegativeInfinity)).otherwise(-s).as("negsim"),
            lit(cid).as("cid"))
        }: _*)).getField("cid")
      val byMi = (1 until m).foldLeft(when(col("mi") === 0, bestCid(bs(0)))) {
        (acc, mi) => acc.when(col("mi") === mi, bestCid(bs(mi)))
      }
      val both = e.select(col("id"), col("mi"),
          PqExpressions.pqTrainAssign(col("mi"), col("sv"), col("n"), bs, sub).as("f"),
          byMi.as("l"))
        .collect()
      both.foreach { r =>
        assert(r.getLong(2) == r.getLong(3),
          s"seed $seed id ${r.getLong(0)} mi ${r.getInt(1)}: " +
            s"fused ${r.getLong(2)} != literal ${r.getLong(3)}")
      }
    }
  }

  test("degenerate policy: zero vectors and zero centroids follow the documented NaN rules") {
    import spark.implicits._
    // books: book 0 all regular; book 1 has a zero-norm centroid (cid 2)
    val bs: Seq[Seq[(Long, Array[Double])]] = Seq(
      (0 until 4).map(j => (j.toLong, rnd(1000 + j, sub))),
      (0 until 4).map(j =>
        (j.toLong, if (j == 2) Array.fill(sub)(0.0) else rnd(2000 + j, sub))))
    val df = Seq(
      (0L, Seq.fill(dims)(0.0)), // zero vector: every cosine NaN
      (1L, rnd(99L, dims).toSeq) // regular vector
    ).toDF("id", "v")

    // encode: NaN never chosen — the zero VECTOR (all-NaN sims) falls
    // back to index 0 (first entry, +Inf tie); a regular vector never
    // picks book 1's zero CENTROID
    val codes = df.select(col("id"),
        PqExpressions.pqCodes(col("v"), bs, sub).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 0), "all-NaN sims fall back to the first index")
    assert(codes(1L)(1) != 2, "a zero-norm centroid is never chosen by encode")

    // cosines: NaN propagates raw (the comparators own the policy)
    val cos = df.filter(col("id") === 1L)
      .select(PqExpressions.centroidCosines(
        slice(col("v"), 1 + sub, sub), sqrt(dot(slice(col("v"), 1 + sub, sub),
          slice(col("v"), 1 + sub, sub))), bs(1)).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(cos(2).isNaN && !cos(0).isNaN,
      "zero centroid yields NaN cosine, regular centroids stay finite")

    // training: NaN chosen FIRST (ORDER BY sim DESC puts NaN first in
    // the oracle) — a regular vector assigned within book 1 lands on
    // the zero-norm centroid's cid
    val assigned = df.filter(col("id") === 1L)
      .select(PqExpressions.pqTrainAssign(lit(1),
        slice(col("v"), 1 + sub, sub), sqrt(dot(slice(col("v"), 1 + sub, sub),
          slice(col("v"), 1 + sub, sub))), bs, sub).as("cid"))
      .collect()(0).getLong(0)
    assert(assigned == 2L, "training assignment picks the NaN (zero-norm) centroid first")
  }
}
