package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) multi-dimensional data layout.
  *
  * Interleaving the bits of several clustering keys gives a single
  * sort key whose ranges are spatially local in EVERY dimension — the
  * layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: after
  * range-partitioning by the Z-value, a filter on ANY of the
  * interleaved columns prunes most files, not just a filter on the
  * leading sort column.
  *
  * The interleave is plain bit arithmetic on longs (`shiftright`,
  * `bitwiseAND`, multiply by a power-of-two literal), fully inside
  * whole-stage codegen; the layout step is one `repartitionByRange`
  * (sampled range boundaries, no global sort) + an in-partition sort.
  */
object ZOrderLayout {

  /** Morton code of two columns, `bits` bits each (max 31): bit i of
    * `x` lands at position 2i+1, bit i of `y` at position 2i.
    * Columns must already be non-negative and < 2^bits (mask/mod first).
    */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(yl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduceLeft(_ + _)
  }

  /** SQL rendering of [[interleave]] for the DuckDB oracle (`>>` and
    * `&` bind looser than `*` there, so every term is parenthesized).
    */
  def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i + 1)} + (($y >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")

  /** Cluster `df` into `numPartitions` Z-ordered ranges over two key
    * columns (each taken mod 2^bits). This is the write-side layout
    * operator: follow with a partitioned write and both keys become
    * prunable. The Z column is dropped — ordering survives in the
    * file layout, which is the point.
    */
  def clusterByZ(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numPartitions: Int): DataFrame = {
    val mask = (1L << bits) - 1
    val z = interleave(col(xCol).cast("long").bitwiseAND(lit(mask)),
      col(yCol).cast("long").bitwiseAND(lit(mask)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
