package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per-SF cold/warm timings for named SparkEntry queries —
  * the BENCH_SCALING.json feed. One JVM for the whole sweep; per
  * query and SF the query runs twice and BOTH times print (the warm
  * run2 is the artifact value; run1 carries the family's
  * first-execution tax). Inter-run cache scrub matches Bench's.
  *
  * Usage: runMain graft.tools.ScalingSweep q169_pq_delete[,q170_...]
  */
object ScalingSweep {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q169_pq_delete", "q170_ivf_cell_stats", "q171_train_linear"))
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaling")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, Double]]()
    for (sf <- sfs; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        t
      }
      val sfKey = "sf" + sf.split("sf").last
      out.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap())(sfKey) =
        math.round(times(1) * 100) / 100.0
      System.err.println(f"[sweep] $name $sfKey cold=${times(0)}%.2f warm=${times(1)}%.2f")
    }
    spark.stop()
    println(out.map { case (q, m) =>
      "\"" + q + "\": {" + m.map { case (k, v) => "\"" + k + "\": " + v }.mkString(", ") + "}"
    }.mkString("{", ",\n ", "}"))
  }
}
