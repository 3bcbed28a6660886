package graft
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
class RangeJoinWidthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)
  test("bucketed interval join is invariant to bucket width") {
    val left = (0 until 200).map(i =>
      (i.toLong % 5, ts(f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:00:00"), i.toLong))
      .toDF("k", "t", "eid")
    val right = (0 until 40).map(i =>
      (i.toLong % 5, ts(f"2024-01-${1 + i % 25}%02d 00:00:00"),
        ts(f"2024-01-${3 + i % 25}%02d 12:00:00"), i.toLong))
      .toDF("rk", "ws", "we", "wid")
    val widths = Seq(3600L, 86400L, 7L * 86400L)
    val results = widths.map { w =>
      operators.RangeJoin.bucketedIntervalJoin(
        left, right, "k", "rk", "t", "ws", "we", Seq("wid"), w)
        .select("eid", "wid").as[(Long, Long)].collect().toSet
    }
    val naive = left.join(right,
      left("k") === right("rk") && left("t") >= right("ws") && left("t") <= right("we"))
      .select("eid", "wid").as[(Long, Long)].collect().toSet
    assert(results.forall(_ == naive), s"sizes: ${results.map(_.size)} vs ${naive.size}")
    assert(naive.nonEmpty)
  }

  test("inverted intervals match nothing; runaway intervals fail loudly") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "t", "eid")
    val inverted = Seq(
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-01 00:00:00"), 9L))
      .toDF("rk", "ws", "we", "wid")
    assert(operators.RangeJoin.bucketedIntervalJoin(
      left, inverted, "k", "rk", "t", "ws", "we", Seq("wid"), 3600).count() == 0)

    val sentinel = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"), 9L))
      .toDF("rk", "ws", "we", "wid")
    val e = intercept[Exception] {
      operators.RangeJoin.bucketedIntervalJoin(
        left, sentinel, "k", "rk", "t", "ws", "we", Seq("wid"), 3600,
        maxBucketsPerInterval = 1000).count()
    }
    assert(e.getMessage != null)
  }
}
