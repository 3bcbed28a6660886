package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Dev probe for the q63 cold-start question (VERDICT r6 next-round
  * #6): where does the dup-clusters pipeline's first execution spend
  * its time, and what does the bench-style JIT warmup buy? Prints
  * phase timings for a cold run, then N warm repeats, in ONE JVM.
  *
  * Usage: runMain graft.tools.ClusterTiming <sfDir> [warmup]
  * `warmup` replays Bench.scala's near-dup warmup before the cold
  * measurement (so "cold" then means "cold query, warm JIT" — the
  * state a bench run measures).
  */
object ClusterTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val doWarm = args.contains("warmup")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster-timing] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    if (doWarm) timed("bench-style warmup") {
      val docsWarm = Tables.load(spark, sfDir, "documents").limit(300)
      // the FULL verified near-dup pipeline (not just the LSH candidate
      // step): q63's probe executes the jaccard-verify joins, and in
      // bench priority order q63 runs before q23 would warm them
      val pairsWarm = Dedup.jaccardNearDupPairsCached(
        docsWarm, "doc_id", "text", 9, 3, threshold = 0.5)
      Dedup.dupClusters(
        docsWarm.select(col("doc_id")), pairsWarm.df, "doc_id").count()
      pairsWarm.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    def runQ63(tag: String): Unit = {
      val d = Tables.load(spark, sfDir, "documents")
      val cached = timed(s"$tag: build pairs (lazy)") {
        Dedup.jaccardNearDupPairsCached(d, "doc_id", "text", 9, 3,
          threshold = 0.5)
      }
      val cl = timed(s"$tag: dupClusters (probe)") {
        Dedup.dupClustersCached(d.select(col("doc_id")), cached.df, "doc_id")
      }
      timed(s"$tag: materialize clusters") {
        cl.df.write.format("noop").mode("overwrite").save()
      }
      cached.unpersist(); cl.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    runQ63("cold")
    runQ63("warm1")
    runQ63("warm2")
    spark.stop()
  }
}
