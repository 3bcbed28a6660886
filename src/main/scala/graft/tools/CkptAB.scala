package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17 optimization round): A/B the guide §3.3 plan-truncation
  * lever on the reference-LM family — localCheckpoint the model-sized
  * count tables after training, so the scoring join chain plans over
  * tiny LogicalRDDs instead of carrying N copies of the training
  * subtree into every AQE re-optimization. Both arms in one warm JVM,
  * interleaved, min-of-warm-runs. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.CkptAB
  */
object CkptAB {
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
    import graft.operators.Ranking

    val docs = graft.Tables.load(spark, sfDir, "documents")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // q191 shape: order-3 train + score + buckets (the family's modal cost)
    def armPlain(): Double = t {
      val m = Ranking.refLm3Train(docs, "doc_id", "text", col("lang") === "en")
      noop(Ranking.refLm3PerplexityBuckets(
        Ranking.refLm3Score(docs, "doc_id", "text", m)))
      clear()
    }
    def armCkpt(): Double = t {
      val m0 = Ranking.refLm3Train(docs, "doc_id", "text", col("lang") === "en")
      val m = Ranking.RefLm3Model(
        Ranking.RefLmModel(
          m0.base.unigrams.localCheckpoint(),
          m0.base.contexts.localCheckpoint(),
          m0.base.bigrams.localCheckpoint(),
          m0.base.totals.localCheckpoint()),
        m0.trigrams.localCheckpoint(),
        m0.triContexts.localCheckpoint())
      noop(Ranking.refLm3PerplexityBuckets(
        Ranking.refLm3Score(docs, "doc_id", "text", m)))
      clear()
    }
    armPlain(); armCkpt() // warm-in
    val res = (1 to 3).map(_ => (armPlain(), armCkpt()))
    println(f"q191-shape  plain=${res.map(_._1).min}%.2f  ckpt=${res.map(_._2).min}%.2f" +
      f"  (all plain=${res.map(_._1).mkString(",")} ckpt=${res.map(_._2).mkString(",")})")
    spark.stop()
  }
}
