package graft.tools

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

import graft.config.DbConfig
import graft.sinks.JdbcSyncWriter

/** Runnable example of the scale-out upsert path: a DataFrame staged
  * through Spark's parallel JDBC writer, applied with one atomic MERGE.
  */
object MergeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val db = DbConfig("jdbc:derby:memory:mergedemo;create=true")
    val c = DriverManager.getConnection(db.url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE inventory (sku INT PRIMARY KEY, qty INT)")
    st.executeUpdate("INSERT INTO inventory VALUES (100, 5), (200, 7)")

    def dump(label: String): Unit = {
      val rs = st.executeQuery("SELECT sku, qty FROM inventory ORDER BY sku")
      val rows = Iterator.continually(rs).takeWhile(_.next())
        .map(r => s"${r.getInt(1)}:${r.getInt(2)}").toList
      println(s"[merge-demo] $label -> ${rows.mkString(", ")}")
    }
    dump("before")

    val upserts = Seq((200, 9), (300, 1), (400, 2)).toDF("sku", "qty")
    val n = JdbcSyncWriter.mergeViaStaging(
      upserts, db, "inventory", "sku", Seq("sku", "qty"))
    println(s"[merge-demo] merged $n rows")
    dump("after (200 updated, 300/400 inserted)")

    c.close()
    spark.stop()
  }
}
