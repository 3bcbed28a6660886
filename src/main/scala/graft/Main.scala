package graft

import org.apache.spark.sql.SparkSession

import graft.config.SyncConfig
import graft.core.SyncRunner

/** CLI entry (reference `main.go:38-56`): `--config <yaml> [--dry-run]`.
  * Loads the YAML sync config, runs the sync (or prints the dry-run
  * execution plan), and reports per-table results.
  */
object Main {
  def main(args: Array[String]): Unit = {
    var configPath = ""
    var dryRun = false
    args.foreach {
      case "--dry-run" | "-dry-run" => dryRun = true
      case a if a.startsWith("--config=") => configPath = a.stripPrefix("--config=")
      case a if !a.startsWith("-") && configPath.isEmpty => configPath = a
      case a => ()
    }
    if (configPath.isEmpty) {
      System.err.println("usage: graft.Main --config=<sync.yaml> [--dry-run]")
      sys.exit(2)
    }

    val config0 = SyncConfig.fromYamlFile(configPath)
    val config = config0.copy(dryRun = dryRun || config0.dryRun)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-sync")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val results = SyncRunner.run(spark, config)
      results.foreach { r =>
        r.plan match {
          case Some(p) => println(p.render)
          case None =>
            println(s"[sync] ${r.table} (${r.mode}): " +
              s"${r.inserts} inserted, ${r.updates} updated, ${r.deletes} deleted")
        }
      }
      if (config.dryRun) println("[sync] dry run — no changes were written")
    } catch {
      case e: Exception =>
        System.err.println(s"[sync] FAILED: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
