package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The registered session SQL surface: every GraftFunctions entry
  * callable from spark.sql, values matching the Column-API originals.
  */
class SqlSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.register(s)
    s
  }

  private def one[T](sql: String): T =
    spark.sql(sql).collect().head.get(0).asInstanceOf[T]

  test("array_dot and array_cosine via spark.sql") {
    assert(one[Double]("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))") == 11.0)
    val c = one[Double]("SELECT array_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))")
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("hex_prefix matches the md5-prefix integer the oracles use") {
    // md5('a') = 0cc175b9c0f1b6a831c399e269772661; first 8 hex digits
    val expected = java.lang.Long.parseLong("0cc175b9", 16)
    assert(one[Long]("SELECT hex_prefix(md5('a'))") == expected)
    // and agrees with the Column-API helper on an arbitrary value
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaColumn = Seq("xyz").toDF("s")
      .select(graft.operators.Sampling.hexPrefixValue(md5(col("s"))))
      .as[Long].head()
    assert(one[Long]("SELECT hex_prefix(md5('xyz'))") == viaColumn)
  }

  test("sign_bucket renders leading-dimension signs") {
    assert(one[String](
      "SELECT sign_bucket(array(0.5D, -0.25D, 1.0D, -2.0D), 4)") == "1010")
    assert(one[String](
      "SELECT sign_bucket(array(-1.0D, 0.0D), 2)") == "01") // 0 counts as +
  }

  test("canonical renders by input type like the diff engine") {
    assert(one[String]("SELECT canonical(1.0D)") == "1")
    assert(one[String]("SELECT canonical(2.5D)") == "2.5")
    assert(one[String]("SELECT canonical(true)") == "true")
    assert(one[String]("SELECT canonical(CAST(NULL AS STRING))") == "")
    assert(one[String]("SELECT canonical(DATE'2024-01-02')") == "2024-01-02")
    assert(one[String]("SELECT canonical(42)") == "42")
  }

  test("topk_freq aggregates via spark.sql") {
    import spark.implicits._
    Seq("a", "a", "a", "b", "b", "c").toDF("v").createOrReplaceTempView("sqlspec_t")
    val rows = spark.sql(
      "SELECT topk_freq(v, 2, 16) FROM sqlspec_t").collect()
    assert(rows.length == 1 && rows.head.get(0) != null)
  }
}
