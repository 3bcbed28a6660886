package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
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

  test("stateful streaming sessionization matches batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:00:10"), 1, "click", 0),
      Ev(3, Timestamp.valueOf("2024-01-01 10:00:05"), 2, "view", 0))
    val batch2 = Seq(
      // 50s gap > 30s -> closes user 1's first session
      Ev(4, Timestamp.valueOf("2024-01-01 10:01:00"), 1, "click", 0))
    // sentinel far in the future pushes the watermark so open sessions
    // time out and emit
    val sentinel = Ev(99, Timestamp.valueOf("2024-01-01 12:00:00"), 999, "x", 0)

    val stream = MemoryStream[Ev]
    val q = graft.streaming.EventStreams
      .sessionizeStream(stream.toDF(), gapSeconds = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    stream.addData(sentinel)
    q.processAllAvailable()
    // one extra empty batch lets the timeout fire after the watermark
    // moved past the sentinel
    stream.addData(Seq.empty[Ev]: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out")
      .filter(col("user_id") =!= 999)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    val batchDf = (batch1 ++ batch2).toDF()
    val expected = graft.operators.Sessionize
      .sessions(batchDf, "user_id", "ts", 30, "event_id")
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed == expected)
    assert(expected.size == 3) // user1 x2 sessions, user2 x1
  }

  test("stream-stream attribution join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 09:00:00"), 1, "signup", 0),
      Ev(2, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "purchase", 5),
      Ev(3, Timestamp.valueOf("2024-01-01 09:30:00"), 2, "signup", 0),
      // next day: outside the 24h window of user 2's signup
      Ev(4, Timestamp.valueOf("2024-01-03 10:00:00"), 2, "purchase", 7),
      Ev(5, Timestamp.valueOf("2024-01-01 11:00:00"), 3, "purchase", 9))

    val stream = MemoryStream[Ev]
    stream.addData(rows: _*)
    val streamed = EventStreams.runToMemory(
      EventStreams.purchaseAttributionStream(stream.toDF(), 24), "attrib_out",
      outputMode = "append")
      .select("event_id", "user_id", "signup_us", "purchase_us")
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = EventStreams.purchaseAttribution(rows.toDF(), 24)
      .select("event_id", "user_id", "signup_us", "purchase_us")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch.map(_._1) == Set(2L)) // only user 1 converts in-window
  }

  test("watermarked dedup stream drops in-watermark duplicate event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.dedupStream(stream.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    stream.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 0),
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:01"), 1, "click", 0), // dup id
      Ev(2, Timestamp.valueOf("2024-01-01 10:00:02"), 1, "view", 0))
    q.processAllAvailable()
    stream.addData(
      Ev(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "view", 0), // dup id, later batch
      Ev(3, Timestamp.valueOf("2024-01-01 10:10:01"), 2, "click", 0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L))
  }

  test("streaming heavy hitters: state accumulates across batches, top-k exact under capacity") {
    import spark.implicits._
    import graft.streaming.{HHItem, HHOut}
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[HHItem]
    val q = EventStreams.heavyHittersStream(stream.toDS(), capacity = 10, k = 2)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    stream.addData(
      HHItem("click", "u1"), HHItem("click", "u1"), HHItem("click", "u2"),
      HHItem("view", "u9"))
    q.processAllAvailable()
    stream.addData(
      HHItem("click", "u2"), HHItem("click", "u2"), HHItem("click", "u3"))
    q.processAllAvailable()
    q.stop()
    // update-mode memory sink appends every snapshot; counts are
    // monotonic, so the max per (key, item) is the final state
    val fin = spark.table("hh_out").as[HHOut].collect()
      .groupBy(r => (r.key, r.item))
      .map { case (ki, rs) => ki -> rs.map(_.cnt).max }
    // final totals: click u1=2 u2=3 u3=1, view u9=1; k=2 keeps u2,u1
    assert(fin(("click", "u2")) == 3L && fin(("click", "u1")) == 2L)
    assert(fin(("view", "u9")) == 1L)
    assert(!fin.contains(("click", "u3"))) // rank 3 never in a top-2 snapshot
    // zero error bounds: capacity was never exceeded
    assert(spark.table("hh_out").as[HHOut].collect().forall(_.err == 0L))
  }
}
