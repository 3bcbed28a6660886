package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("... array_dot(a, b) ...")` works alongside the Column
  * API.
  *
  * Two paths:
  *   - [[register]]: imperative, for an existing session.
  *   - [[GraftExtensions]]: `SparkSessionExtensions` injection for
  *     `spark.sql.extensions=graft.functions.GraftExtensions` /
  *     `SparkSession.builder().withExtensions(...)`.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> (exprs => ArrayDotProduct(exprs(0), exprs(1))),
    "array_cosine" -> (exprs => ArrayCosine(exprs(0), exprs(1))),
    // topk_freq(col, k, capacity) — SpaceSaving heavy hitters
    "topk_freq" -> (exprs => {
      if (exprs.size != 3)
        throw new IllegalArgumentException(
          s"topk_freq(col, k, capacity) takes 3 arguments, got ${exprs.size}")
      SpaceSavingTopK(
        exprs(0),
        intLit(exprs(1), "topk_freq k"),
        intLit(exprs(2), "topk_freq capacity")).toAggregateExpression()
    }),
    // kmv_hashes(hashCol, k) — k smallest distinct hashes (KMV sketch)
    "kmv_hashes" -> (exprs => {
      if (exprs.size != 2)
        throw new IllegalArgumentException(
          s"kmv_hashes(hash, k) takes 2 arguments, got ${exprs.size}")
      KmvSketch(exprs(0), intLit(exprs(1), "kmv_hashes k"))
        .toAggregateExpression()
    }),
    // The stable scalar helpers the oracle twins are written against,
    // exposed to spark.sql callers. These are Column compositions, not
    // single Catalyst nodes — the graftbridge converters lift the
    // argument Expressions into Columns and back (ResolveFunctions only
    // invokes a builder once the children are resolved, so dataType is
    // available where needed).
    // hex_prefix(md5_hex) — first 8 hex digits as an exact long
    "hex_prefix" -> (exprs => {
      if (exprs.size != 1)
        throw new IllegalArgumentException(
          s"hex_prefix(hash) takes 1 argument, got ${exprs.size}")
      bridge.sessionExpression(
        graft.operators.Sampling.hexPrefixValue(bridge.column(exprs(0))))
    }),
    // sign_bucket(vec, dims) — leading-dimension sign pattern, e.g. "1010"
    "sign_bucket" -> (exprs => {
      if (exprs.size != 2)
        throw new IllegalArgumentException(
          s"sign_bucket(vec, dims) takes 2 arguments, got ${exprs.size}")
      bridge.sessionExpression(graft.operators.Similarity.signBucket(
        bridge.column(exprs(0)), intLit(exprs(1), "sign_bucket dims")))
    }),
    // canonical(col) — the diff engine's cross-type canonical rendering
    "canonical" -> (exprs => {
      if (exprs.size != 1)
        throw new IllegalArgumentException(
          s"canonical(col) takes 1 argument, got ${exprs.size}")
      bridge.sessionExpression(
        graft.core.Canonical.canonical(bridge.column(exprs(0)), exprs(0).dataType))
    }))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, name),
        builder)
    }
}

/** Session-extensions entry point: injects graft functions and the
  * custom top-k planner strategy at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
