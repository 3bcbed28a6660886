package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17 optimization round): time the PHASES of the
  * reference-LM query shape separately — stamp assert, scoring,
  * bucket report — so the per-query stage budget is attributed to the
  * part that owns it before any restructure. Bench methodology (noop
  * sink, warm session, warm run after a cold run); not part of the
  * driver contract.
  *
  * Usage: runMain graft.tools.PhaseTime [runs]
  */
object PhaseTime {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
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

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.load(spark, sfDir, "documents")
    // build the stored artifact locally (untimed), mirroring
    // SparkEntry.refLmArtifact, which is private to the entry object
    val p = java.nio.file.Files
      .createTempDirectory("graft-phasetime").resolve("model").toString
    graft.operators.Ranking.writeRefLm(
      graft.operators.Ranking.refLmTrain(
        docs, "doc_id", "text", col("lang") === "en"), p)
    graft.core.SnapshotStamp.write(docs, "doc_id", s"$p/stamp")

    (1 to runs).foreach { i =>
      println(s"== run $i ==")
      time("assertFresh") {
        graft.core.SnapshotStamp.assertFresh(docs, "doc_id", s"$p/stamp")
      }
      val m = time("readRefLm") { graft.operators.Ranking.readRefLm(spark, p) }
      val scored = graft.operators.Ranking.refLmScore(docs, "doc_id", "text", m)
      time("score(noop)") { noop(scored) }
      time("buckets(noop)") {
        noop(graft.operators.Ranking.refLmPerplexityBuckets(scored))
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
