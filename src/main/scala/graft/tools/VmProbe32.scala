package graft.tools

import org.apache.spark.sql.SparkSession

/** VmProbe at bench-identical settings (local[32], 32 shuffle
  * partitions): discriminates host-level degradation that only
  * appears under full-width load from the idle health VmProbe reads.
  */
object VmProbe32 {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-vmprobe32")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    println("VMPROBE32 probes=[" + times.map(t => f"$t%.2f").mkString(" ") + "]")
  }
}
