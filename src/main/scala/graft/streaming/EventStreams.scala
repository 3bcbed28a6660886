package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
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

  /** File-source stream over an events parquet directory. */
  def readEventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

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
