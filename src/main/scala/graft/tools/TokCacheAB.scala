package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r17 optimization round): the JobTrace finding is that a
  * train-in-window LM query executes the scan+tokenize lineage once
  * PER count-table broadcast build (6x at order 3) because exchange
  * reuse does not apply across separate broadcast-build jobs, and each
  * execution is single-task (one parquet row-group). A/B/C the fix:
  *   A: current code (refLm3Train + refLm3Score + buckets)
  *   B: tokenize once into a PERSISTED frame, derive all six count
  *      tables from it (pool tf persisted too)
  *   C: B plus a scale-adaptive repartition of the tokenized frame
  *      (only when scan partitions < cores — a no-op at real scale)
  * Same warm JVM, interleaved, min of warm runs. Results must be
  * value-identical; this probe also cross-checks the bucket rows.
  */
object TokCacheAB {
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
    import graft.operators.{Ranking, TextAnalysis}

    val docs = graft.Tables.load(spark, sfDir, "documents")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // bigramPairs / trigramTriples are private to Ranking; reproduce the
    // count tables with equivalent SQL shapes for the A/B only.
    def pairsOf(a: org.apache.spark.sql.Column) = expr(
      "transform(slice(__a, 1, greatest(size(__a) - 1, 0)), (w, i) -> struct(w AS w1, element_at(__a, i + 2) AS w2))")
    def triplesOf(a: org.apache.spark.sql.Column) = expr(
      "transform(slice(__a, 1, greatest(size(__a) - 2, 0)), (w, i) -> struct(w AS w1, element_at(__a, i + 2) AS w2, element_at(__a, i + 3) AS w3))")

    def trainFrom(toks: DataFrame): Ranking.RefLm3Model = {
      val uni = toks.select(explode(col("__a")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c1"))
      val big = toks.select(explode(pairsOf(col("__a"))).as("__bg"))
        .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val ctx = big.groupBy("w1").agg(sum("cb").as("ctx"))
      val tot = uni.agg(sum("c1").as("n_ref_tokens"), count(lit(1)).as("vocab"))
      val tri = toks.select(explode(triplesOf(col("__a"))).as("__tg"))
        .select(col("__tg.w1").as("w1"), col("__tg.w2").as("w2"), col("__tg.w3").as("w3"))
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
      val tctx = tri.groupBy("w1", "w2").agg(sum("ct").as("ctx3"))
      Ranking.RefLm3Model(Ranking.RefLmModel(uni, ctx, big, tot), tri, tctx)
    }

    def armA(): Double = t {
      val m = Ranking.refLm3Train(docs, "doc_id", "text", col("lang") === "en")
      noop(Ranking.refLm3PerplexityBuckets(
        Ranking.refLm3Score(docs, "doc_id", "text", m)))
      clear()
    }
    def mk(repart: Boolean): DataFrame = {
      val base = docs.filter(col("lang") === "en")
        .select(TextAnalysis.tokens(col("text")).as("__a"))
      val spread = if (repart && base.rdd.getNumPartitions < cpus)
        base.repartition(cpus) else base
      spread.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    def armBC(repart: Boolean): Double = t {
      val toks = mk(repart)
      val m = trainFrom(toks)
      noop(Ranking.refLm3PerplexityBuckets(
        Ranking.refLm3Score(docs, "doc_id", "text", m)))
      clear()
    }
    armA(); armBC(false); armBC(true)
    val r = (1 to 3).map(_ => (armA(), armBC(false), armBC(true)))
    println(f"q191-shape A(plain)=${r.map(_._1).min}%.2f  B(persistToks)=${r.map(_._2).min}%.2f  C(persist+spread)=${r.map(_._3).min}%.2f")
    println("A runs: " + r.map(x => f"${x._1}%.2f").mkString(",") +
      "  B runs: " + r.map(x => f"${x._2}%.2f").mkString(",") +
      "  C runs: " + r.map(x => f"${x._3}%.2f").mkString(","))
    spark.stop()
  }
}
