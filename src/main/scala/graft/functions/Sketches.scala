package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch operators for 100 TB-scale membership and frequency work,
  * built on Spark's own sketch machinery rather than reimplementations:
  *
  *   - Bloom: `BloomFilterAggregate` / `BloomFilterMightContain` — the
  *     exact expressions Spark's runtime row-group filtering injects,
  *     lifted into the public Column API via the graftbridge. The build
  *     is a distributed aggregate; only the finished bit array (a few
  *     MB) ever reaches the driver, and it folds into downstream plans
  *     as a constant, so the membership probe stays codegen'd.
  *   - Count-Min: `functions.count_min_sketch` (distributed, mergeable)
  *     plus a driver-side decoder for point estimates.
  *
  * Both hash with xxhash64 on the build AND probe side — the sketches
  * compare hashes, so the two sides must agree.
  */
object Sketches {

  /** Distributed Bloom-filter build: aggregate `xxhash64(c)` into a
    * serialized filter (binary column).
    */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    graftbridge.column(
      new BloomFilterAggregate(graftbridge.expression(xxhash64(c)), expectedItems)
        .toAggregateExpression())

  /** Run the Bloom build now and return the serialized filter. One
    * distributed job; the returned bytes are `lit(...)`-foldable.
    */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long): Array[Byte] =
    df.agg(bloomAgg(c, expectedItems).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Membership probe against a serialized Bloom filter. `bloom` must
    * be foldable (a `lit` of [[buildBloom]] bytes or a scalar subquery)
    * — the expression deserializes it once per task, not per row.
    */
  def mightContain(bloom: Column, c: Column): Column =
    graftbridge.column(
      new BloomFilterMightContain(
        graftbridge.expression(bloom),
        graftbridge.expression(xxhash64(c))))

  /** Distributed Count-Min build over a string column; returns the
    * serialized sketch. eps bounds overestimation: for total count N,
    * `true <= estimate <= true + eps * N` with probability
    * `confidence` per query.
    */
  def buildCountMin(
      df: DataFrame,
      c: Column,
      eps: Double,
      confidence: Double,
      seed: Int): CountMinSketch = {
    val bytes = df
      .agg(count_min_sketch(c, lit(eps), lit(confidence), lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Distributed Count-Min build from PRE-AGGREGATED (item, count)
    * rows: each partition folds its rows into a local sketch with
    * `add(item, count)` and the partial sketches merge pairwise. Same
    * sketch as [[buildCountMin]] over the raw occurrences (CMS addition
    * is linear), but the distributed pass touches one row per DISTINCT
    * item instead of one per occurrence — the right build shape when a
    * frequency table already exists or is cheap (one partial-aggregated
    * shuffle), which at corpus scale it usually is.
    *
    * Hashes the item's STRING; probe estimates with
    * `sketch.estimateCount(item: String)`.
    */
  def buildCountMinWeighted(
      df: DataFrame,
      item: Column,
      weight: Column,
      eps: Double,
      confidence: Double,
      seed: Int): CountMinSketch = {
    val rows = df.select(item.cast("string").as("i"), weight.cast("long").as("w"))
    rows.queryExecution.toRdd
      .mapPartitions { it =>
        val cms = CountMinSketch.create(eps, confidence, seed)
        it.foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1))
            cms.add(r.getUTF8String(0).toString, r.getLong(1))
        }
        Iterator.single(cms)
      }
      .treeReduce { (a, b) => a.mergeInPlace(b); a }
  }
}
