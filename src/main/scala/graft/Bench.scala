package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology: AQE on; a warm-up action first so JIT/codegen/session
  * startup don't land in the first measured query; results are fully
  * materialized through the noop sink (count() would let Spark prune
  * work that a real consumer pays for).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm up: session machinery, parquet footer reads, and JIT/codegen
    // for the operator classes the queries use (hash agg, sort-merge +
    // broadcast join, window, explode) — measured numbers then reflect
    // steady state rather than first-use compilation.
    Tables.All.foreach(t => Tables.load(spark, sfDir, t).count())
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = spark.range(100000).select(
        col("id"), (col("id") % 97).as("k"), (col("id") % 7).cast("double").as("v"))
      val w = Window.partitionBy("k").orderBy("id")
      r.groupBy("k").agg(sum(col("v").cast("decimal(18,2)")), count(lit(1))).count()
      r.join(r.select(col("k"), col("v").as("v2")).limit(1000), Seq("k")).count()
      r.withColumn("rn", row_number().over(w))
        .withColumn("run", sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("rn") <= 2).count()
      r.select(explode(split(concat_ws(" ", col("k"), col("v"), lit("x")), " "))).count()
      r.select(md5(concat(lit("s:"), col("id").cast("string")))).count()
    }

    // Two timed runs per query, keep the min: the box is shared, and a
    // single run can absorb multi-second external stalls. A failing
    // query must NOT contribute its (fast) failure time — it is
    // reported in "failed" instead of "queries".
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      // queries that persist() intermediates (the LSH family) would
      // otherwise pin blocks across the whole run and squeeze later
      // queries' execution memory: isolate queries from each other, but
      // let a query's second run keep its own steady-state caches.
      // localCheckpoint blocks (dup-cluster edges) are RDD-level and
      // invisible to clearCache — release those explicitly too.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      if (times.isEmpty) { failed += name; None }
      else Some(name -> times.min)
    }
    // Millisecond precision keeps the single JSON line compact: the
    // harness keeps only a bounded tail of the output, and 100+ queries
    // at full double precision overflow it (the line then arrives
    // truncated and unparseable).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
