package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Fused product-quantization expressions.
  *
  * The PQ family (encode / LUT / train-assign) was previously spelled
  * as literal expression trees: `m·ks` `ArrayDotProduct(slice(v, …),
  * typedLit(centroid))` nodes plus a struct-per-centroid `array_min`
  * comparator — ~200 Catalyst nodes per reference to a m=4/ks=16 book,
  * and the hot queries reference such a tree 2-3 times. The VALUES are
  * right, but Catalyst analysis + Janino compilation of those trees
  * measured as multi-second DRIVER stalls (60% of q165's wall time was
  * stage gaps; see PLANS.md round-9 notes), re-paid per query and per
  * Lloyd iteration.
  *
  * Each expression here is ONE Catalyst node holding the codebook as a
  * flat reference object (`ctx.addReferenceObj`), so planning cost is
  * constant in `m·ks` and the generated code is a tight fused loop
  * instead of a 64-branch expression forest.
  *
  * Numerical contract (bit-for-bit with the literal-tree formulation,
  * which the DuckDB oracles replay):
  *
  *  - every dot product is the sequential left-to-right fold of
  *    [[ArrayDotProduct]];
  *  - centroid norms are `math.sqrt(Σ x²)` computed on the DRIVER at
  *    expression construction (same fold order);
  *  - cosine is `dot / (norm * cn)` evaluated in exactly that
  *    association;
  *  - double comparisons use `java.lang.Double.compare`, which is
  *    Spark's total order for doubles (-0.0 < 0.0, NaN greatest) — the
  *    same order `array_min` applied to the comparator structs.
  */
object PqExpressions {

  /** Flattened driver-side view of per-subspace codebooks: contiguous
    * centroid coordinates plus offsets, norms and ids, ready to attach
    * as codegen reference objects.
    */
  final case class FlatBooks(
      subDim: Int,
      entryOff: Array[Int], // size nEntries+1, offsets into coords
      coords: Array[Double],
      norms: Array[Double],
      cids: Array[Long],
      bookOff: Array[Int] // size m+1, entry-index bounds per subspace
  ) {
    def m: Int = bookOff.length - 1
    def nEntries: Int = cids.length
  }

  def flatten(books: Seq[Seq[(Long, Seq[Double])]], subDim: Int): FlatBooks = {
    val entries = books.flatten
    val entryOff = entries.map(_._2.length).scanLeft(0)(_ + _).toArray
    val coords = entries.flatMap(_._2).toArray
    val norms = entries.map(e => math.sqrt(e._2.map(x => x * x).sum)).toArray
    val cids = entries.map(_._1).toArray
    val bookOff = books.map(_.size).scanLeft(0)(_ + _).toArray
    FlatBooks(subDim, entryOff, coords, norms, cids, bookOff)
  }

  private def seqBooks(books: Seq[Seq[(Long, Array[Double])]]): Seq[Seq[(Long, Seq[Double])]] =
    books.map(_.map { case (cid, v) => (cid, v.toIndexedSeq) })

  /** Column API: PQ codes of a full-width vector against frozen books —
    * `array<int>` of length m, entry mi = index (position in the
    * cid-sorted book) of the centroid maximizing cosine with the mi-th
    * sub-slice; NaN cosines lose to every finite one (mapped past
    * +Infinity), ties to the lower index.
    */
  def pqCodes(vec: Column, books: Seq[Seq[(Long, Array[Double])]], subDim: Int): Column =
    graftbridge.column(PqCodesExpr(graftbridge.expression(vec), seqBooks(books), subDim))

  /** Column API: the flat ADC lookup table — `array<double>` of
    * Σ|book| entries, entry (mi, j) = dot of the query's mi-th
    * sub-slice with centroid j of book mi.
    */
  def pqLut(vec: Column, books: Seq[Seq[(Long, Array[Double])]], subDim: Int): Column =
    graftbridge.column(PqLutExpr(graftbridge.expression(vec), seqBooks(books), subDim))

  /** Column API: cosines of a full-width vector (with precomputed
    * norm) against every centroid of ONE book, in book order —
    * `array<double>`, entry j = `dot(vec, c_j) / (norm · cn_j)`. The
    * fused replacement for `array(dot(v, typedLit(c_j)) / (n · cn_j),
    * …)`; NaN propagates exactly as the literal tree (zero-norm side →
    * NaN element), comparators downstream keep their own NaN policy.
    */
  def centroidCosines(
      vec: Column, norm: Column,
      cents: Seq[(Long, Array[Double])]): Column =
    graftbridge.column(CentroidCosinesExpr(
      graftbridge.expression(vec), graftbridge.expression(norm),
      cents.map { case (cid, v) => (cid, v.toIndexedSeq) }))

  /** Column API: the training-loop assignment — centroid ID (not
    * index) of the best centroid of book `mi` for an ALREADY-SLICED
    * sub-vector with precomputed norm; NaN cosines WIN (mapped below
    * -Infinity — the Lloyd oracle's `ORDER BY sim DESC` puts NaN
    * first), ties to the lower centroid id.
    */
  def pqTrainAssign(
      mi: Column, subVec: Column, norm: Column,
      books: Seq[Seq[(Long, Array[Double])]], subDim: Int): Column =
    graftbridge.column(PqTrainAssignExpr(
      graftbridge.expression(mi), graftbridge.expression(subVec),
      graftbridge.expression(norm), seqBooks(books), subDim))
}

/** See [[PqExpressions.pqCodes]]. */
case class PqCodesExpr(
    child: Expression,
    books: Seq[Seq[(Long, Seq[Double])]],
    subDim: Int)
    extends UnaryExpression {

  @transient private lazy val fb = PqExpressions.flatten(books, subDim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(PqCodesExpr.codes(
      v, fb.subDim, fb.bookOff, fb.entryOff, fb.coords, fb.norms))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookOff = ctx.addReferenceObj("bookOff", fb.bookOff, "int[]")
    val entryOff = ctx.addReferenceObj("entryOff", fb.entryOff, "int[]")
    val coords = ctx.addReferenceObj("coords", fb.coords, "double[]")
    val norms = ctx.addReferenceObj("norms", fb.norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqCodesExpr.codes(
         |    $v, $subDim, $bookOff, $entryOff, $coords, $norms));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}

object PqCodesExpr {
  /** Shared interpreted/codegen kernel — the fused equivalent of the
    * per-subspace `array_min(array(struct(negsim, j)…))` tree.
    */
  def codes(
      v: ArrayData, subDim: Int, bookOff: Array[Int],
      entryOff: Array[Int], coords: Array[Double], norms: Array[Double]): Array[Int] = {
    val m = bookOff.length - 1
    val n = v.numElements()
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      // a vector shorter than dims yields a short (or empty) slice —
      // the literal tree's slice() semantics; clamping here keeps a
      // malformed row from reading past the array (AIOOBE on generic
      // rows, silent garbage on unsafe rows)
      val svLen = math.max(0, math.min(subDim, n - base))
      // sub-vector norm: sqrt of the same left fold dot(sv, sv) uses
      var nAcc = 0.0
      var i = 0
      while (i < svLen) {
        val x = v.getDouble(base + i)
        nAcc += x * x
        i += 1
      }
      val svn = math.sqrt(nAcc)
      var bestKey = Double.PositiveInfinity
      var bestJ = 0
      var first = true
      var e = bookOff(mi)
      while (e < bookOff(mi + 1)) {
        val cOff = entryOff(e)
        val cLen = math.min(svLen, entryOff(e + 1) - cOff)
        var d = 0.0
        var t = 0
        while (t < cLen) {
          d += v.getDouble(base + t) * coords(cOff + t)
          t += 1
        }
        val negsim = d / (svn * norms(e)) * -1.0
        // NaN (zero-norm side) maps to +Infinity: never beats a finite
        // similarity, and among all-NaN books the FIRST (lowest index)
        // wins — exactly the literal tree's when(isnan, +Inf) + min
        val key = if (java.lang.Double.isNaN(negsim)) Double.PositiveInfinity else negsim
        if (first || java.lang.Double.compare(key, bestKey) < 0) {
          bestKey = key
          bestJ = e - bookOff(mi)
          first = false
        }
        e += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    out
  }
}

/** See [[PqExpressions.pqLut]]. */
case class PqLutExpr(
    child: Expression,
    books: Seq[Seq[(Long, Seq[Double])]],
    subDim: Int)
    extends UnaryExpression {

  @transient private lazy val fb = PqExpressions.flatten(books, subDim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(PqLutExpr.lut(
      v, fb.subDim, fb.bookOff, fb.entryOff, fb.coords))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookOff = ctx.addReferenceObj("bookOff", fb.bookOff, "int[]")
    val entryOff = ctx.addReferenceObj("entryOff", fb.entryOff, "int[]")
    val coords = ctx.addReferenceObj("coords", fb.coords, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqLutExpr.lut(
         |    $v, $subDim, $bookOff, $entryOff, $coords));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

object PqLutExpr {
  /** Entry (mi, j) = dot(v[mi·subDim ..], centroid j of book mi) —
    * the same sequential fold as `dot(slice(v, …), typedLit(c))`.
    */
  def lut(
      v: ArrayData, subDim: Int, bookOff: Array[Int],
      entryOff: Array[Int], coords: Array[Double]): Array[Double] = {
    val m = bookOff.length - 1
    val n = v.numElements()
    val out = new Array[Double](bookOff(m))
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      // short-vector clamp — see PqCodesExpr.codes
      val svLen = math.max(0, math.min(subDim, n - base))
      var e = bookOff(mi)
      while (e < bookOff(mi + 1)) {
        val cOff = entryOff(e)
        val cLen = math.min(svLen, entryOff(e + 1) - cOff)
        var d = 0.0
        var t = 0
        while (t < cLen) {
          d += v.getDouble(base + t) * coords(cOff + t)
          t += 1
        }
        out(e) = d
        e += 1
      }
      mi += 1
    }
    out
  }
}

/** See [[PqExpressions.centroidCosines]]. */
case class CentroidCosinesExpr(
    left: Expression, // full-width vector (array<double>)
    right: Expression, // precomputed vector norm (double)
    cents: Seq[(Long, Seq[Double])])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  @transient private lazy val fb =
    PqExpressions.flatten(Seq(cents), cents.headOption.map(_._2.length).getOrElse(0))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_cosines"

  override protected def nullSafeEval(vec: Any, norm: Any): Any =
    new GenericArrayData(CentroidCosinesExpr.cosines(
      vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double],
      fb.entryOff, fb.coords, fb.norms))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val entryOff = ctx.addReferenceObj("entryOff", fb.entryOff, "int[]")
    val coords = ctx.addReferenceObj("coords", fb.coords, "double[]")
    val norms = ctx.addReferenceObj("norms", fb.norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, n) => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CentroidCosinesExpr.cosines(
         |    $v, $n, $entryOff, $coords, $norms));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidCosinesExpr =
    copy(left = newLeft, right = newRight)
}

object CentroidCosinesExpr {
  /** Entry j = `dot(v, c_j) / (norm · cn_j)` — the same fold and
    * association as `dot(v, typedLit(c_j)) / (normCol * lit(cn_j))`.
    */
  def cosines(
      v: ArrayData, norm: Double, entryOff: Array[Int],
      coords: Array[Double], norms: Array[Double]): Array[Double] = {
    val nEntries = norms.length
    val n = v.numElements()
    val out = new Array[Double](nEntries)
    var e = 0
    while (e < nEntries) {
      val cOff = entryOff(e)
      val cLen = math.min(n, entryOff(e + 1) - cOff)
      var d = 0.0
      var t = 0
      while (t < cLen) {
        d += v.getDouble(t) * coords(cOff + t)
        t += 1
      }
      out(e) = d / (norm * norms(e))
      e += 1
    }
    out
  }
}

/** See [[PqExpressions.pqTrainAssign]]. */
case class PqTrainAssignExpr(
    first: Expression, // subspace index (int)
    second: Expression, // sub-vector (array<double>)
    third: Expression, // precomputed sub-vector norm (double)
    books: Seq[Seq[(Long, Seq[Double])]],
    subDim: Int)
    extends TernaryExpression {

  @transient private lazy val fb = PqExpressions.flatten(books, subDim)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, array<double>, double), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_train_assign"

  override protected def nullSafeEval(mi: Any, vec: Any, norm: Any): Any =
    PqTrainAssignExpr.assign(
      mi.asInstanceOf[Int], vec.asInstanceOf[ArrayData],
      norm.asInstanceOf[Double], fb.bookOff, fb.entryOff, fb.coords,
      fb.norms, fb.cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookOff = ctx.addReferenceObj("bookOff", fb.bookOff, "int[]")
    val entryOff = ctx.addReferenceObj("entryOff", fb.entryOff, "int[]")
    val coords = ctx.addReferenceObj("coords", fb.coords, "double[]")
    val norms = ctx.addReferenceObj("norms", fb.norms, "double[]")
    val cids = ctx.addReferenceObj("cids", fb.cids, "long[]")
    nullSafeCodeGen(ctx, ev, (mi, v, n) => {
      s"""
         |${ev.value} = graft.functions.PqTrainAssignExpr.assign(
         |  $mi, $v, $n, $bookOff, $entryOff, $coords, $norms, $cids);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqTrainAssignExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqTrainAssignExpr {
  /** Best centroid ID of book `mi` for an already-sliced sub-vector:
    * maximizes `dot / (norm · cn)`; NaN cosines map BELOW -Infinity
    * (they win — the Lloyd oracle's ORDER BY sim DESC puts NaN first),
    * ties to the lower centroid id (books iterate in cid order).
    */
  def assign(
      mi: Int, v: ArrayData, norm: Double, bookOff: Array[Int],
      entryOff: Array[Int], coords: Array[Double], norms: Array[Double],
      cids: Array[Long]): Long = {
    val n = v.numElements()
    var bestKey = Double.PositiveInfinity
    var bestCid = 0L
    var first = true
    var e = bookOff(mi)
    while (e < bookOff(mi + 1)) {
      val cOff = entryOff(e)
      val cLen = math.min(n, entryOff(e + 1) - cOff)
      var d = 0.0
      var t = 0
      while (t < cLen) {
        d += v.getDouble(t) * coords(cOff + t)
        t += 1
      }
      val s = d / (norm * norms(e))
      // the literal tree's key: when(isnan(s), -Inf).otherwise(-s);
      // strict-less keeps the FIRST on ties = the struct-min's
      // lower-cid rule (iteration is in cid order)
      val key = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else -s
      if (first || java.lang.Double.compare(key, bestKey) < 0) {
        bestKey = key
        bestCid = cids(e)
        first = false
      }
      e += 1
    }
    bestCid
  }
}
