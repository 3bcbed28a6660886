package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.operators.Dedup.CachedDF

/** Distributed prefix (running) sums over a global total order.
  *
  * The naive `sum().over(Window.orderBy(...))` with no partitioning
  * moves the ENTIRE dataset through one task — the canonical
  * accidental-single-partition trap, fatal at scale. This operator
  * computes the same result with the classic two-level scan:
  *
  *   1. range-repartition + sort by the order key (each partition owns
  *      a contiguous key range, ranges are ordered by partition id);
  *   2. one tiny per-partition total aggregate, collected (numPartitions
  *      rows) and turned into per-partition starting offsets on the
  *      driver — the "scan of sums";
  *   3. a window running sum WITHIN each partition (safe: partitions
  *      are balanced by the range partitioner) plus the broadcast
  *      offset.
  *
  * The order columns must form a total order (include a unique
  * tiebreaker); otherwise rows equal under the ordering could land in
  * either of two adjacent partitions and the running sum would not be
  * reproducible.
  */
object PrefixSum {

  /** [[runningSum]] plus a release handle: the input is
    * localCheckpoint'd (it feeds two plans — the offsets aggregate and
    * the result), and those RDD blocks stay pinned until
    * `CachedDF.unpersist()` runs after the caller's terminal action.
    */
  def runningSumCached(
      df: DataFrame,
      orderBy: Seq[Column],
      valueCol: String,
      cumCol: String = "cum"): CachedDF = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totalsDf = ranged
      .groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__t"))
    // sum() WIDENS the value type (int -> long, float -> double,
    // decimal(p,s) -> decimal(p+10,s)); the offset column must use the
    // widened type or the offsets frame fails schema validation
    val sumType = totalsDf.schema("__t").dataType
    val totals = totalsDf
      .collect()
      .map(r => r.getInt(0) -> r.get(1))
      .sortBy(_._1)
    // exclusive prefix of the partition totals -> starting offset per pid.
    // Sums stay in the column's own numeric type via untyped addition on
    // the driver (Long or java.math.BigDecimal for exact decimals).
    var acc: Any = null
    val offsets = totals.map { case (pid, t) =>
      val start = acc
      acc = (acc, t) match {
        case (null, v) => v
        case (a, null) => a
        case (a: Long, v: Long) => a + v
        case (a: java.math.BigDecimal, v: java.math.BigDecimal) => a.add(v)
        case (a: Double, v: Double) => a + v
        case (a, v) => throw new IllegalArgumentException(
          s"unsupported running-sum type: ${a.getClass} + ${v.getClass}")
      }
      (pid, start)
    }
    val spark = df.sparkSession
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map {
        case (pid, start) => Row(pid, start)
      }, 1),
      StructType(Seq(
        StructField("__pid", IntegerType, nullable = false),
        StructField("__offset", sumType, nullable = true))))
    val w = Window.partitionBy(col("__pid")).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val result = ranged
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(cumCol,
        sum(col(valueCol)).over(w) +
          coalesce(col("__offset"), lit(0).cast(sumType)))
      .drop("__pid", "__offset")
    CachedDF(result, Nil, Seq(() => graftbridge.unpersistCheckpointed(ranged)))
  }

  /** Adds `cumCol` = running sum of `valueCol` over the total order
    * `orderBy` (Column sort orders, e.g. `Seq(col("score").desc,
    * col("id"))`). One-shot convenience over [[runningSumCached]]; the
    * intermediate checkpoint blocks stay pinned for the session — long-
    * lived sessions should use the cached variant and release after
    * their action.
    */
  def runningSum(
      df: DataFrame,
      orderBy: Seq[Column],
      valueCol: String,
      cumCol: String = "cum"): DataFrame =
    runningSumCached(df, orderBy, valueCol, cumCol).df

  /** Greedy streaming sequence packing: assign each row (document) to
    * the context-window bin its FIRST token lands in, walking the
    * corpus in `orderBy` order. `binCol` = exclusive-prefix-sum div
    * capacity — one distributed prefix sum, no per-bin state. A
    * document longer than the remaining space overflows its bin
    * (contiguous greedy semantics — bins average `capacity` tokens but
    * a single row never splits); trim oversized documents with
    * [[TextAnalysis.tokenChunks]] first if hard caps matter.
    */
  def packBins(
      df: DataFrame,
      orderBy: Seq[Column],
      tokenCol: String,
      capacity: Long,
      binCol: String = "bin_id"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // SQL `div`, not `/`: Column./ on longs is double division, which
    // rounds past 2^53 and would misplace documents in huge corpora
    runningSum(df, orderBy, tokenCol, "__cum")
      .withColumn("__first", col("__cum") - col(tokenCol))
      .withColumn(binCol, expr(s"__first div ${capacity}L"))
      .drop("__cum", "__first")
  }

  /** Concat-then-chunk packing plan — the OTHER pretraining packing
    * discipline next to [[packBins]]'s greedy no-split bins: documents
    * concatenate in `orderBy` order into one token stream that is cut
    * into fixed `seqLen` windows, and a document SPLITS across window
    * boundaries (the GPT-style loader: zero padding waste, every
    * window exactly full). The plan gives a sharded loader each
    * document's exact placement:
    * `(…, chunk_first, chunk_last, n_chunks, offset_in_chunk)` —
    * which training sequences the document feeds, and where in the
    * first one its tokens start.
    *
    * One distributed prefix sum and a projection — no extra shuffle,
    * and the same 2^53-safe `div` arithmetic as [[packBins]].
    * Zero-token documents contribute nothing to the stream and are
    * dropped from the plan.
    */
  def chunkPlan(
      df: DataFrame,
      orderBy: Seq[Column],
      tokenCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    runningSum(df.filter(col(tokenCol) > 0), orderBy, tokenCol, "__cum")
      .withColumn("__start", col("__cum") - col(tokenCol))
      .withColumn("chunk_first", expr(s"__start div ${seqLen}L"))
      .withColumn("chunk_last", expr(s"(__cum - 1) div ${seqLen}L"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
      .withColumn("offset_in_chunk", expr(s"__start % ${seqLen}L"))
      .drop("__cum", "__start")
  }
}
