package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The transforms are written once against a plain DataFrame so the
  * SAME code path serves batch (correctness oracle) and Structured
  * Streaming (`readStream` -> transform -> `writeStream`); only the
  * source/sink wiring differs. That is the designed-for-scale shape:
  * a streaming job's logical plan is identical to its batch twin, and
  * Catalyst plans the incremental execution.
  */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
final case class OpenSession(start_us: Long, end_us: Long, n: Long)
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
final case class HHItem(key: String, item: String)
final case class HHState(capacity: Int, counts: Map[String, (Long, Long)])
final case class HHOut(key: String, item: String, cnt: Long, err: Long)
final case class KmvState(k: Int, hashes: Seq[Long])
final case class KmvOut(key: String, n_sketch: Long, est_distinct: Double)

object EventStreams {

  /** Tumbling 1-hour aggregation keyed by (hour, event_type); hour is
    * surfaced as epoch micros so results are engine-portable.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Watermarked streaming twin of [[hourlyAgg]], using the built-in
    * `window()` tumbling window so late data is handled by the engine.
    */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming gap sessionization via `flatMapGroupsWithState` — the
    * stateful twin of the batch `graft.operators.Sessionize`.
    *
    * Per user the state is the one open session; each micro-batch folds
    * its (sorted) events in, emitting sessions that a gap closes. The
    * open session is finalized when the event-time timeout fires (no
    * events for `gapSeconds` past the watermark). At scale this is the
    * canonical shape: state per key is O(1), the shuffle is by user,
    * and the watermark bounds state retention.
    *
    * Input must carry a watermark on `ts` (see [[sessionizeStream]]).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def fold(
        userId: Long,
        it: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, s.start_us, s.end_us, s.n))
      }
      val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
      var cur = state.getOption
      it.toSeq.sortBy(_.ts_us).foreach { e =>
        cur match {
          case None => cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
          case Some(s) if e.ts_us - s.end_us > gapUs =>
            closed += SessionOut(userId, s.start_us, s.end_us, s.n)
            cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
          case Some(s) =>
            // min() also absorbs late rows that sort before the open
            // session's start (watermark already bounds how late)
            cur = Some(OpenSession(math.min(s.start_us, e.ts_us),
              math.max(s.end_us, e.ts_us), s.n + 1L))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end_us / 1000L + gapSeconds * 1000L)
      }
      closed.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Wire a raw events DataFrame (event_id, ts, user_id, ...) into
    * [[sessionize]]: watermark + typed projection.
    */
  def sessionizeStream(
      events: DataFrame,
      gapSeconds: Long,
      watermark: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(
        col("user_id").cast("long").as("user_id"),
        // keep the watermark-tagged ts column — projecting it away
        // would defeat the event-time-timeout watermark check
        col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
    sessionize(typed, gapSeconds)
  }

  /** Purchases attributed to every signup of the same user within the
    * preceding `windowHours`. Written against a plain DataFrame so the
    * SAME join serves batch (and the DuckDB oracle) and the
    * stream-stream twin [[purchaseAttributionStream]].
    */
  def purchaseAttribution(events: DataFrame, windowHours: Int = 24): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $windowHours HOURS"))
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("signup_ts")).as("signup_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"))
  }

  /** Stream-stream twin of [[purchaseAttribution]]: both sides are
    * watermarked and the join carries the time-range condition, so the
    * engine can expire signup state `windowHours` past the watermark —
    * bounded state, the requirement for an unbounded stream join.
    */
  def purchaseAttributionStream(
      events: DataFrame,
      windowHours: Int = 24,
      watermark: String = "1 hour"): DataFrame =
    purchaseAttribution(events.withWatermark("ts", watermark), windowHours)

  /** Exactly-once event stream: drop duplicate event ids, with state
    * bounded by the watermark (a duplicate arriving later than the
    * watermark allows is the source's SLA violation, not ours).
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** File-source stream over an events parquet directory. */
  def readEventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Streaming heavy hitters: one SpaceSaving sketch per key as
    * `flatMapGroupsWithState` state, emitting that key's current top-k
    * snapshot every batch (Update mode). State per key is O(capacity)
    * regardless of stream length — the unbounded-domain frequency
    * problem (trending items per category, hot users per event type)
    * with bounded memory; exact while distinct items per key fit the
    * capacity, Metwally-bounded overestimates beyond it. Reuses the
    * batch aggregate's [[graft.functions.SpaceSavingBuffer]], so the
    * streaming and batch paths share one eviction/merge implementation.
    *
    * The effective capacity is recorded in the state: restarting a
    * checkpointed query with a SMALLER capacity keeps each key's stored
    * capacity (shrinking a SpaceSaving sketch in place cannot preserve
    * its error bound); a larger capacity takes effect immediately.
    * These restart semantics apply to checkpoints that already carry
    * the capacity field — the state schema is versioned by Spark's
    * state-store compatibility check, so older-schema checkpoints
    * cannot be resumed by this build.
    */
  def heavyHittersStream(
      items: Dataset[HHItem],
      capacity: Int,
      k: Int): Dataset[HHOut] = {
    import items.sparkSession.implicits._
    def fold(
        key: String,
        it: Iterator[HHItem],
        state: GroupState[HHState]): Iterator[HHOut] = {
      val cap = math.max(capacity, state.getOption.map(_.capacity).getOrElse(capacity))
      val buf = new graft.functions.SpaceSavingBuffer(cap)
      state.getOption.foreach(_.counts.foreach { case (i, ce) =>
        buf.counts.update(i, ce)
      })
      it.foreach(x => buf.add(x.item))
      state.update(HHState(cap, buf.counts.toMap))
      buf.counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
        .map { case (i, (c, e)) => HHOut(key, i, c, e) }.iterator
    }
    items
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
  }

  /** Streaming per-key distinct-count estimation — the
    * [[graft.functions.KmvSketch]] aggregate's ingest-time twin: each
    * key's state is its KMV sketch (the k smallest distinct item
    * hashes, ≤ k longs per key FOREVER, however many items stream
    * through), updated per micro-batch and re-emitted as
    * `(key, n_sketch, est_distinct)` in Update mode. Items hash with
    * the engine's shared convention (32-bit md5 prefix), so a batch
    * [[graft.operators.TextAnalysis.vocabOverlapKmv]]-style job over
    * the same items reproduces the stream's estimates exactly.
    *
    * The estimate rule matches the batch aggregate: under k distinct
    * hashes seen → exact count; at/over → `(k−1)·2³² / h_(k)`.
    */
  def distinctEstimateStream(
      items: Dataset[HHItem],
      k: Int): Dataset[KmvOut] = {
    import items.sparkSession.implicits._
    def fold(
        key: String,
        it: Iterator[HHItem],
        state: GroupState[KmvState]): Iterator[KmvOut] = {
      val kk = state.getOption.map(_.k).getOrElse(k)
      val buf = new graft.functions.KmvBuffer(kk)
      state.getOption.foreach(_.hashes.foreach(buf.set.add))
      it.foreach { x =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(x.item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 hex digits = first 4 bytes, big-endian unsigned —
        // identical to Sampling.hexPrefixValue(md5(item))
        buf.add(((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
          ((md(2) & 0xffL) << 8) | (md(3) & 0xffL))
      }
      state.update(KmvState(kk, buf.set.toSeq))
      val n = buf.set.size
      // h_(k) = 0 is possible (k = 1 and an item whose 32-bit md5
      // prefix is zero): the estimator would divide by zero — fall
      // back to the exact size, which is what the sketch degenerates
      // to there anyway. Rounded to 6 decimals so stream and batch
      // (q148's aggregate rounds the same way) stay bit-identical.
      val est =
        if (n < kk || buf.set.last == 0L) n.toDouble
        else BigDecimal((kk - 1).toLong * 4294967296L / buf.set.last.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Iterator(KmvOut(key, n.toLong, est))
    }
    items
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
  }

  /** Memory-sink runner for tests: processes all available input
    * synchronously and returns the named in-memory table.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
