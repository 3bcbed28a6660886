package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing is the shuffle-elimination lever for repeated big-table
  * joins at 100 TB: both sides pre-hashed into the same number of
  * buckets on the join key join WITHOUT any Exchange. This spec proves
  * the property on this build of Spark — if a version change ever
  * breaks bucketed-join planning, this fails before production does.
  */
class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // a previously failed run can leave the managed location behind
    // with no catalog entry; saveAsTable then refuses the location
    Seq("b_orders", "b_lines").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
    }

    val orders = (1L to 2000L).map(k => (k, s"status${k % 3}")).toDF("okey", "status")
    val lines = (1L to 6000L).map(i => (i % 2000 + 1, i * 7 % 100)).toDF("okey", "qty")
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")

    // disable broadcast for the check: the point is that the
    // SORT-MERGE path needs no exchange on bucketed tables (broadcast
    // would trivially avoid one for this toy size)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val got = try {
      val joined = spark.table("b_lines")
        .join(spark.table("b_orders"), "okey")
        .groupBy("status").agg(sum("qty").as("q"))
      val rows = joined.as[(String, Long)].collect()
      assert(rows.length == 3)

      // the join itself must be exchange-free; only the tiny post-join
      // aggregation may shuffle
      val plan = joined.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      rows.toMap
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // correctness against the unbucketed twin
    val want = lines.join(orders, "okey").groupBy("status").agg(sum("qty").as("q"))
      .as[(String, Long)].collect().toMap
    assert(got == want)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }
}
