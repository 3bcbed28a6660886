package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe for the round-16 finding that VM degradation amplifies
  * with JOB COUNT (the 16 sustained-degraded queries were all
  * multi-job driver-loop families, 8-12x, while single-job queries ran
  * ~1-2x): run named SparkEntry queries and print, per query, the
  * job count, summed job wall, and the driver-gap share
  * (wall − Σ job wall — scheduling/planning/collect turnarounds, the
  * part a degraded scheduler stretches per barrier). The table this
  * prints is the data behind which families to put on a job-count
  * diet next.
  *
  * Usage: runMain graft.tools.JobCount <query> [query ...]
  *   (no args = the 16 queries the r16 driver run flagged)
  */
object JobCount {
  val R16Flagged: Seq[String] = Seq(
    "q47_decontaminate", "q78_profile_drift", "q95_ann_recall",
    "q99_novelty", "q108_bigram_lm", "q129_containment",
    "q151_bpe_merges", "q153_bpe_encode", "q166_crossmodal_dedup",
    "q172_recall_sweep", "q175_gate_select", "q178_calibration",
    "q186_bpe_fit_by_lang", "q193_semdedup", "q194_semdedup_ingest",
    "q198_kn3_buckets")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else R16Flagged
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
    // stored inputs outside any measured window, exactly as Bench does
    graft.SparkEntry.prewarmStoredInputs(spark, sfDir)

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStart.put(j.jobId, j.time); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStart.remove(j.jobId)
        if (s != null) { jobMs.addAndGet(j.time - s); jobs.incrementAndGet(); () }
      }
    })

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"job_s"}%8s ${"gap_s"}%7s ${"gap%"}%5s")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: unknown query")
        case Some(fn) =>
          jobMs.set(0); jobs.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(800) // listener bus settles async
          val js = jobMs.get() / 1000.0
          val gap = math.max(wall - js, 0.0)
          println(f"$name%-28s $wall%8.2f ${jobs.get()}%5d $js%8.2f $gap%7.2f ${100 * gap / wall}%4.0f%%")
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
