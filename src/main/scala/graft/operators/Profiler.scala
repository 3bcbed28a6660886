package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: one pass over the data computing per-column
  * health stats (row/null/distinct counts, min/max rendered as
  * strings), returned as a tall (column, stat...) frame.
  *
  * All columns profile in ONE aggregate — a single scan + single
  * (partial-aggregated) reduction regardless of column count, not one
  * job per column. Distinct counts are exact; swap
  * `approx_count_distinct` in where estimates suffice at extreme
  * cardinalities.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one output row per profiled column
    val structs = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"))
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*")
  }
}
