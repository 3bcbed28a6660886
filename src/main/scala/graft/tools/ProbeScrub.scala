package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-faithful ad-hoc probe: fills the stored-input memos the way
  * Bench's warmup does, then times each named query with the SAME
  * inter-query cache scrub Bench applies — so numbers reflect the
  * measured path, not plan-cache reuse (plain Probe's blind spot).
  * Dev tool, not part of the driver contract.
  */
object ProbeScrub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.All.foreach(t => graft.Tables.load(spark, sfDir, t).count())
    def scrub(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val t0 = System.nanoTime()
    graft.SparkEntry.prewarmStoredInputs(spark, sfDir)
    println(f"[probescrub] prewarm: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    scrub()
    val runs = sys.env.get("PROBE_RUNS").map(_.toInt).getOrElse(2)
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        val t1 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probescrub] $name run$i: ${(System.nanoTime() - t1) / 1e9}%.2f s")
        scrub()
      }
    }
    spark.stop()
  }
}
