package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout is how a 100 TB table avoids reading
  * 99.9% of itself: a filter on the partition column must become a
  * PartitionFilter (directory pruning), not a data filter. Pinned here
  * the same way BucketingSpec pins exchange-free joins.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("filter on the partition column prunes directories at plan time") {
    val dir = Files.createTempDirectory("graft-part").resolve("t").toString
    val df = (1 to 3000).map(i => (i.toLong, s"d${i % 30}", i * 3 % 100)).toDF("id", "day", "v")
    df.write.partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("day") === "d7").agg(sum("v"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(day"),
      s"partition filter did not reach the scan:\n$plan")

    // only the d7 directory's rows are read: partitions pruned == 29/30
    val expected = (1 to 3000).filter(_ % 30 == 7).map(i => i * 3 % 100).sum.toLong
    assert(q.as[Long].head() == expected)
  }
}
