package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: run a named SparkEntry query and print per-stage wall
  * time + shuffle volumes from task metrics, heaviest first — which
  * STAGE a slow query actually spends its time in (ShuffleAudit's
  * volume view, but timed, and for any query by name).
  *
  * Usage: runMain graft.tools.StageTime <query> [runs]
  */
object StageTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q140_weighted_jaccard")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
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

    final case class St(id: Int, name: String, ms: Long, cpuMs: Long,
        shufWrite: Long, shufRead: Long, records: Long)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
          .getOrElse(-1L)
        stages += St(i.stageId, i.name.takeWhile(_ != '\n'), ms,
          m.executorCpuTime / 1000000, m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.recordsWritten)
      }
    })

    // optional Bench-style near-dup warmup before the first timed run:
    // WARM_DOCS=<n> WARM_ROUNDS=<r> — for sizing the bench warmup
    val warmDocs = sys.env.get("WARM_DOCS").map(_.toInt).getOrElse(0)
    val warmRounds = sys.env.get("WARM_ROUNDS").map(_.toInt).getOrElse(1)
    if (warmDocs > 0) {
      val t0 = System.nanoTime()
      (1 to warmRounds).foreach { _ =>
        val docsWarm = graft.Tables.load(spark, sfDir, "documents").limit(warmDocs)
        val pairsWarm = graft.operators.Dedup.jaccardNearDupPairsCached(
          docsWarm, "doc_id", "text", 9, 3, threshold = 0.5)
        graft.operators.Dedup.dupClusters(
          docsWarm.select(org.apache.spark.sql.functions.col("doc_id")),
          pairsWarm.df, "doc_id").count()
        pairsWarm.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      println(f"[warm] $warmDocs docs x $warmRounds rounds: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val fn = graft.SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus settles async
      println(f"== $name run$r: $total%.2f s, ${stages.size} stages ==")
      stages.sortBy(-_.ms).take(12).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms cpu ${s.cpuMs}%6d ms " +
          f"shufW ${s.shufWrite / 1024}%8d KiB shufR ${s.shufRead / 1024}%8d KiB " +
          f"rec ${s.records}%9d  ${s.name}")
      }
      val sched = stages.map(_.ms).sum
      println(f"  stage-time sum ${sched / 1000.0}%.2f s (gaps = driver/planning time)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
