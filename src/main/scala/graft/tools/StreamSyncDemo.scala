package graft.tools

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.config.{DbConfig, SyncConfig, TableSyncConfig}
import graft.streaming.StreamingSync

/** Runnable example of the incremental sync mode: files dropped into a
  * directory become micro-batch upserts into a JDBC table, exactly-once
  * across restarts via the stream checkpoint.
  */
object StreamSyncDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val db = DbConfig("jdbc:derby:memory:demodb;create=true")
    val c = DriverManager.getConnection(db.url)
    c.createStatement().executeUpdate(
      "CREATE TABLE accounts (id INT PRIMARY KEY, balance DOUBLE)")
    c.close()

    val src = Files.createTempDirectory("demo-src")
    val ckpt = Files.createTempDirectory("demo-ckpt").toString
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("balance", DoubleType)))
    val cfg = SyncConfig(db, Seq(TableSyncConfig(
      name = "accounts", filePath = "", mode = "diff", primaryKey = "id")))

    def dump(label: String): Unit = {
      val c2 = DriverManager.getConnection(db.url)
      val rs = c2.createStatement().executeQuery(
        "SELECT id, balance FROM accounts ORDER BY id")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => s"${r.getInt(1)}->${r.getDouble(2)}").toList
      println(s"[demo] $label: ${rows.mkString(", ")}")
      c2.close()
    }

    Files.writeString(src.resolve("t1.csv"), "id,balance\n1,100.0\n2,200.0\n")
    StreamingSync.start(spark, cfg, src.toString, schema, ckpt).awaitTermination()
    dump("after file 1")

    Files.writeString(src.resolve("t2.csv"), "id,balance\n2,250.0\n3,300.0\n")
    StreamingSync.start(spark, cfg, src.toString, schema, ckpt).awaitTermination()
    dump("after file 2 (2 updated, 3 inserted, 1 untouched)")

    // restart with the same checkpoint and no new files: nothing replays
    StreamingSync.start(spark, cfg, src.toString, schema, ckpt).awaitTermination()
    dump("after restart with no new files")

    spark.stop()
  }
}
