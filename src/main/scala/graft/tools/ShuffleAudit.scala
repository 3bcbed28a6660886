package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, DocPipeline, Similarity}

/** Dev probe for the shuffle-volume audit (VERDICT r6 next-round #7):
  * run the three biggest pipelines at a scale factor and report REAL
  * per-stage shuffle write volume from task metrics — what the
  * join-size preflight (q131) estimates, measured. Comparing two SFs
  * gives the growth slope of every stage's shuffle payload vs its
  * input; a stage whose payload grows faster than the input is the
  * one that breaks first at 100 TB.
  *
  * Usage: runMain graft.tools.ShuffleAudit <sfDir> [<sfDir2> ...]
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, shufW: Long, shufR: Long,
        input: Long, records: Long)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        stages += St(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n'),
          m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
          m.inputMetrics.bytesRead, m.shuffleWriteMetrics.recordsWritten)
      }
    })

    def audit(tag: String, sfDir: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      stages.clear()
      mk.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // listener events are posted async (listenerBus is private[spark];
      // a short settle sleep is enough for a dev probe)
      Thread.sleep(1500)
      val totW = stages.map(_.shufW).sum
      val totIn = stages.map(_.input).sum
      val totRec = stages.map(_.records).sum
      println(f"[audit] $tag%-12s $sfDir%-24s input=${totIn / 1024}%8d KiB " +
        f"shuffleWrite=${totW / 1024}%8d KiB (${totRec}%9d rec) stages=${stages.size}%3d")
      stages.filter(_.shufW > 0).sortBy(-_.shufW).take(5).foreach { s =>
        println(f"[audit]   stage ${s.id}%4d ${s.shufW / 1024}%8d KiB ${s.records}%9d rec  ${s.name.take(60)}")
      }
    }

    sfDirs.foreach { sf =>
      val d = Tables.load(spark, sf, "documents")
      val e = Tables.load(spark, sf, "embeddings")
      audit("neardup", sf) {
        Dedup.jaccardNearDupPairs(d, "doc_id", "text", 9, 3, threshold = 0.5)
      }
      audit("curate", sf) {
        DocPipeline.curate(
          d.filter(col("doc_id") >= 10), d.filter(col("doc_id") < 10),
          "doc_id", "text")
      }
      audit("blocked-decon", sf) {
        Similarity.semanticContamination(
          e.filter(col("vec_id") < 20), e.filter(col("vec_id") >= 20),
          "vec_id", "embedding", threshold = 0.3,
          evalBroadcast = false, srpBits = 3)
      }
    }
    spark.stop()
  }
}
