package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: is the VM healthy enough for a bench artifact run RIGHT
  * NOW? Runs Bench's exact 20M-row probe job (agg + shuffle) a few
  * times in a small session and prints the seconds — healthy is
  * ~0.2-0.5s (first run ~2x for JIT), a degraded window reads 1-10x+.
  * ~30s total; burns no artifact and no sf0.1 IO.
  *
  * Usage: runMain graft.tools.VmProbe [reps]
  */
object VmProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val t00 = System.nanoTime()
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-vmprobe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val initS = (System.nanoTime() - t00) / 1e9
    import org.apache.spark.sql.functions._
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      spark.range(20000000L)
        .select((col("id") % 97).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum("v"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    val fmt = times.map(t => f"$t%.2f").mkString(" ")
    // healthy steady state on this box is ~0.2-0.5s/probe at 8 threads
    println(f"VMPROBE init=$initS%.1fs probes=[$fmt] min=${times.min}%.2f")
  }
}
