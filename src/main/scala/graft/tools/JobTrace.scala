package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev probe (r17 optimization round): per-JOB timeline of one warm
  * query run — job wall, task count, submission gap since the previous
  * job ended, and the job group/description — so the ~N-jobs-per-query
  * budget of the LM/curate families is attributed job by job (which
  * jobs are broadcast builds, which are real stages, where the driver
  * gaps sit). Not part of the driver contract.
  *
  * Usage: runMain graft.tools.JobTrace <query> [warmRuns]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q191_reflm3_bucket")
    val warm = args.lift(1).map(_.toInt).getOrElse(2)
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

    final case class J(id: Int, start: Long, var end: Long = -1,
        var tasks: Int = 0, var stages: Int = 0, desc: String)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val active = new java.util.concurrent.ConcurrentHashMap[Int, Int]() // stage->job
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(j.jobId) = J(j.jobId, j.time, desc = d.takeRight(60))
        j.stageIds.foreach(s => active.put(s, j.jobId))
        jobs(j.jobId).stages = j.stageIds.size
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = jobs.synchronized {
        Option(active.get(t.stageId)).foreach(jid =>
          jobs.get(jid).foreach(_.tasks += 1))
      }
    })

    val fn = graft.SparkEntry.queries(name)
    def once(): Unit = {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    (1 to warm).foreach(_ => once())
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    once()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    jobs.synchronized {
      var prevEnd = -1L
      println(f"${"job"}%4s ${"ms"}%6s ${"gap"}%5s ${"stg"}%3s ${"tasks"}%5s  desc")
      var sumMs = 0L; var sumGap = 0L
      jobs.values.toSeq.sortBy(_.start).foreach { j =>
        val ms = if (j.end > 0) j.end - j.start else -1
        val gap = if (prevEnd > 0) math.max(0, j.start - prevEnd) else 0
        if (j.end > 0) { sumMs += ms; prevEnd = math.max(prevEnd, j.end) }
        sumGap += gap
        println(f"${j.id}%4d $ms%6d $gap%5d ${j.stages}%3d ${j.tasks}%5d  ${j.desc}")
      }
      println(f"[trace] $name warm wall=$wall%.2f s, ${jobs.size} jobs, " +
        f"sum job ms=$sumMs, sum serial gap ms=$sumGap")
    }
    spark.stop()
  }
}
