package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r17 optimization round): within-JVM A/B of a runtime SQL
  * conf on named SparkEntry queries. Cross-JVM timings on this VM swing
  * too much to compare (verify-skill caveat), so both arms run in ONE
  * warm session, interleaved A B A B, and the reported number is the
  * min of each arm's warm runs (min isolates the achievable floor from
  * weather spikes). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.ConfAB <confKey> <valA> <valB> <query> [query ...]
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val Array(key, valA, valB, qs @ _*) = args: @unchecked
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
    graft.SparkEntry.prewarmStoredInputs(spark, sfDir)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (System.nanoTime() - t0) / 1e9
    }

    println(f"${"query"}%-30s ${"A=" + valA}%10s ${"B=" + valB}%10s")
    qs.foreach { name =>
      runOnce(name) // cold warm-in, discarded
      val times = (1 to 2).flatMap { _ =>
        spark.conf.set(key, valA); val a = runOnce(name)
        spark.conf.set(key, valB); val b = runOnce(name)
        Seq(a -> "A", b -> "B")
      }
      val a = times.filter(_._2 == "A").map(_._1).min
      val b = times.filter(_._2 == "B").map(_._1).min
      println(f"$name%-30s $a%10.2f $b%10.2f")
    }
    spark.stop()
  }
}
