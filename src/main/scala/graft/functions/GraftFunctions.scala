package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
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
