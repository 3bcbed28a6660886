package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE behaviors the 100 TB design leans on, demonstrated on synthetic
  * skew small enough for CI: a hot join key whose shuffle partition
  * dwarfs the others must be SPLIT by adaptive skew-join handling, not
  * processed by one straggler task. (At real scale the same plan shape
  * handles a hot domain/user key without manual salting; the manual
  * salted-join operator remains for engines/pipelines with AQE off.)
  */
class AdaptiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled down so ~8 MB of hot key counts as "skewed"
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32768")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // force a sort-merge join: broadcasting the small side would
      // sidestep the skew machinery entirely
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // one pathological key (0) with 200k rows; 1000 healthy keys
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(1, 1001).select(col("id").as("k"), col("id").as("payload")))
      val right = spark.range(0, 1001).select(col("id").as("k"), (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      // the action must run on THIS Dataset's QueryExecution —
      // count()/write build their own, whose final adaptive plan we
      // could not inspect afterwards
      assert(joined.collect().length === 201000)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"adaptive plan did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in the adaptive plan:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
