package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run SQL statements against a session with the test tables
  * registered as temp views (and graft extensions honored via the
  * standard `spark.sql.extensions` conf). Usage:
  *   runMain graft.tools.Sql "SELECT ..." ["SELECT ..."]
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.All.foreach(t =>
      graft.Tables.load(spark, sfDir, t).createOrReplaceTempView(t))
    args.foreach { sql =>
      println(s"[sql] $sql")
      spark.sql(sql).show(50, truncate = false)
    }
    spark.stop()
  }
}
