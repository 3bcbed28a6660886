package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused codegen'd cosine similarity of two `array<double>` columns.
  *
  * The composed form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * is three expression evaluations per candidate pair, each unpacking
  * its operand arrays again; in a pairwise similarity join that is
  * the hot loop's entire cost. This expression computes all three
  * accumulations in one generated function per row-pair.
  *
  * Result is BIT-IDENTICAL to the composed form (and to the DuckDB
  * oracle twin `list_dot_product(a,b)/(sqrt(...)*sqrt(...))`) for
  * every pair with non-zero norms: each accumulator is the same
  * sequential left-to-right fold the separate expressions perform —
  * dot over the common prefix (min length), each norm over its FULL
  * array — and the final expression is `dot / (sqrt(na) * sqrt(nb))`
  * with no reordering. ONE deliberate divergence: a zero-norm vector
  * yields IEEE NaN here, where Spark 4's ANSI `Divide` THROWS
  * DIVIDE_BY_ZERO — a single degenerate vector must not kill a
  * 100 TB scoring job (filter NaNs downstream instead).
  *
  * Null handling matches the composed form: a null array yields null;
  * elements are assumed non-null (embedding vectors).
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.min(na, nb)
    var d = 0.0
    var i = 0
    while (i < n) { d += x.getDouble(i) * y.getDouble(i); i += 1 }
    var sa = 0.0
    i = 0
    while (i < na) { val v = x.getDouble(i); sa += v * v; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val v = y.getDouble(i); sb += v * v; i += 1 }
    d / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val v = ctx.freshName("v")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.min($na, $nb);
         |double $d = 0.0; double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += $a.getDouble($i) * $b.getDouble($i);
         |}
         |for (int $i = 0; $i < $na; $i++) {
         |  double $v = $a.getDouble($i); $sa += $v * $v;
         |}
         |for (int $i = 0; $i < $nb; $i++) {
         |  double $v = $b.getDouble($i); $sb += $v * $v;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}

object ArrayCosine {
  /** Column-level API: fused cosine of two array<double> columns. */
  def apply(a: Column, b: Column): Column =
    graftbridge.column(ArrayCosine(
      graftbridge.expression(a), graftbridge.expression(b)))
}
