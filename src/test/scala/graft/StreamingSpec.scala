package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

final case class Ev(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** The streaming transform must agree with its batch twin — same
  * logical plan, incremental execution.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hourly streaming aggregation matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "click", 1.5),
      Ev(2, Timestamp.valueOf("2024-01-01 10:55:00"), 2, "click", 2.5),
      Ev(3, Timestamp.valueOf("2024-01-01 11:05:00"), 1, "view", 3.0),
      Ev(4, Timestamp.valueOf("2024-01-01 10:20:00"), 3, "view", 0.5))

    val stream = MemoryStream[Ev]
    stream.addData(rows: _*)
    val streamed = EventStreams.runToMemory(
      EventStreams.hourlyAggStream(stream.toDF()), "hourly_out")
      .select("hour_us", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    val batch = EventStreams.hourlyAgg(rows.toDF())
      .select("hour_us", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    assert(streamed == batch)
    assert(batch.size == 3) // (10h click x2) (10h view) (11h view)
  }
}
