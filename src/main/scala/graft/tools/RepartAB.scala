package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17 optimization round): measure whether parallelizing
  * the single-row-group parquet scans (documents/lineitem are ONE task
  * at sf0.1 — one row-group per file, so maxPartitionBytes cannot
  * split them) with an explicit repartition after read pays on the
  * text-heavy pipelines. Both arms in one warm JVM, interleaved,
  * min-of-warm-runs. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.RepartAB
  */
object RepartAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.All.foreach(t => graft.Tables.load(spark, sfDir, t).count())

    val docs = graft.Tables.load(spark, sfDir, "documents")
    println(s"docs scan partitions: ${docs.rdd.getNumPartitions}")
    val docsR = docs.repartition(cpus)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def arm(d: org.apache.spark.sql.DataFrame): Double = t {
      val m = graft.operators.Ranking.refLmTrain(
        d, "doc_id", "text", col("lang") === "en")
      noop(graft.operators.Ranking.refLmPerplexityBuckets(
        graft.operators.Ranking.refLmScore(d, "doc_id", "text", m)))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    arm(docs); arm(docsR) // warm-in
    val as = (1 to 3).map(_ => arm(docs))
    val bs = (1 to 3).map(_ => arm(docsR))
    println(f"q182-shape  plain=${as.min}%.2f  repartitioned=${bs.min}%.2f")
    spark.stop()
  }
}
