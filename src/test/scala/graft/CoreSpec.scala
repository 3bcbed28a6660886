package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Canonical, Differ, PrimaryKeyValidator}

/** Canonicalization golden matrix (mirrors the reference's
  * TestConvertValueToString, dbsync_test.go:1003), the three-way diff
  * (TestDiffData, dbsync_test.go:541), cross-type PK equality
  * (TestPrimaryKey, dbsync_test.go:913), and PK validation rules
  * (primary_key_validator_test.go).
  */
class CoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("canonical: integral floats drop the decimal point") {
    val df = Seq(3.0, 3.5, -2.0, 0.0, 1299.99).toDF("v")
    val got = df.select(Canonical.canonical(col("v"), DoubleType)).as[String].collect()
    assert(got.toSeq == Seq("3", "3.5", "-2", "0", "1299.99"))
  }

  test("canonical: null renders as empty string for every type") {
    val df = spark.sql(
      """SELECT CAST(NULL AS DOUBLE) d, CAST(NULL AS STRING) s,
        |       CAST(NULL AS BOOLEAN) b, CAST(NULL AS TIMESTAMP) t""".stripMargin)
    val got = df.select(
      Canonical.canonical(col("d"), DoubleType),
      Canonical.canonical(col("s"), StringType),
      Canonical.canonical(col("b"), BooleanType),
      Canonical.canonical(col("t"), TimestampType)).collect()(0)
    assert((0 until 4).forall(got.getString(_) == ""))
  }

  test("canonical: booleans and timestamps (RFC3339, UTC)") {
    val df = spark.sql(
      "SELECT true b1, false b2, TIMESTAMP'2023-12-25 15:30:45' ts")
    val got = df.select(
      Canonical.canonical(col("b1"), BooleanType),
      Canonical.canonical(col("b2"), BooleanType),
      Canonical.canonical(col("ts"), TimestampType)).collect()(0)
    assert(got.getString(0) == "true")
    assert(got.getString(1) == "false")
    assert(got.getString(2) == "2023-12-25T15:30:45Z")
  }

  test("goString: byte-for-byte convertValueToString parity (dbsync_test.go:1003)") {
    // the reference golden matrix, including the Go-'g' float cases
    assert(Canonical.goString(null) == "")
    assert(Canonical.goString("hello") == "hello")
    assert(Canonical.goString(true) == "true")
    assert(Canonical.goString(false) == "false")
    assert(Canonical.goString(42) == "42")
    assert(Canonical.goString(8.toByte) == "8")
    assert(Canonical.goString(16.toShort) == "16")
    assert(Canonical.goString(64L) == "64")
    assert(Canonical.goString(3.14f) == "3.14")
    assert(Canonical.goString(3.14159) == "3.14159")
    assert(Canonical.goString(100.0) == "100")
    // time.Time -> RFC3339 (dbsync_test.go:1040-1046)
    assert(Canonical.goString(
      java.sql.Timestamp.from(java.time.Instant.parse("2023-12-25T15:30:45Z")))
      == "2023-12-25T15:30:45Z")
    // Go strconv 'g' corner cases the column path renders differently:
    // exponent -4 stays decimal, below that switches to e-notation
    // with a two-digit signed exponent (verified against Go 1.22)
    assert(Canonical.goString(0.0001) == "0.0001")
    assert(Canonical.goString(0.00001) == "1e-05")
    assert(Canonical.goString(-0.00025) == "-0.00025")
    assert(Canonical.goString(1.5e21) == "1.5e+21")
    assert(Canonical.goString(1e21) == "1e+21")
    assert(Canonical.goString(1e19) == "10000000000000000000")
    assert(Canonical.goString(1234567.25) == "1234567.25")
    assert(Canonical.goString(-42.5) == "-42.5")
    assert(Canonical.goString(Double.NaN) == "NaN")
    assert(Canonical.goString(Double.PositiveInfinity) == "+Inf")
    assert(Canonical.goString(Double.NegativeInfinity) == "-Inf")
  }

  test("isNullOrEmpty matches the reference literal list") {
    val df = Seq("", "null", "NULL", " nil ", "n/a", "NA", "none",
      "undefined", "ok", "0").toDF("v")
    val got = df.select(col("v"), Canonical.isNullOrEmpty(col("v")).as("e"))
      .as[(String, Boolean)].collect().toMap
    assert(got.count(_._2) == 8)
    assert(!got("ok") && !got("0"))
  }

  test("isNullOrEmpty: Go TrimSpace parity and literal backslash-n") {
    // primary_key_validator.go:158 — "\\n" is the two-char backslash-n
    // string, and strings.TrimSpace trims tabs/newlines/NBSP, not just ' '.
    val df = Seq("\\n", " null\t", "\nna\n", " none ", "k1\t", "\na")
      .toDF("v")
    val got = df.select(col("v"), Canonical.isNullOrEmpty(col("v")).as("e"))
      .as[(String, Boolean)].collect().toMap
    assert(got("\\n") && got(" null\t") && got("\nna\n") && got(" none "))
    assert(!got("k1\t") && !got("\na"))
    // whitespace-only values are NOT null-like (Go checks value=="" before
    // trimming and its nullValues list has no ""); they are format errors
    val ws = Seq("\n", "\t", " ").toDF("v")
      .select(Canonical.isNullOrEmpty(col("v")) ||
        !Canonical.invalidPkFormat(col("v"))).as[Boolean].collect()
    assert(ws.forall(_ == false))
  }

  test("invalidPkFormat flags Unicode-space padding like Go TrimSpace") {
    val df = Seq("k1 ", "　k2", "ok").toDF("v")
    val got = df.select(col("v"), Canonical.invalidPkFormat(col("v")).as("b"))
      .as[(String, Boolean)].collect().toMap
    assert(got("k1 ") && got("　k2") && !got("ok"))
  }

  test("diff: insert/update/delete with cross-type pk equality") {
    // file pk is string, db pk is int — "2" must match 2 (dbsync.go:21-48)
    val file = Seq(("1", "alice", 10.0), ("2", "bob-upd", 20.0), ("4", "dave", 40.0))
      .toDF("id", "name", "score")
    val db = Seq((2, "bob", 20.0), (3, "carol", 30.0))
      .toDF("id", "name", "score")
    val d = Differ.diff(file, db, "id")
    assert(d.toInsert.select("id").as[String].collect().sorted.toSeq == Seq("1", "4"))
    assert(d.toUpdate.select("id").as[String].collect().toSeq == Seq("2"))
    assert(d.toDelete.select("id").as[Int].collect().toSeq == Seq(3))
    // update carries before and after values
    val u = d.toUpdate.select(col("name"), col(Differ.DbPrefix + "name")).collect()(0)
    assert(u.getString(0) == "bob-upd" && u.getString(1) == "bob")
  }

  test("diff: integral-float rendering means 20 == 20.0 across sides") {
    val file = Seq(("1", "20.0")).toDF("id", "v")
    val db = Seq((1, 20.0)).toDF("id", "v")
    // string "20.0" vs double 20.0 — canonical gives "20.0" vs "20":
    // differing canonical -> update (string side is not float-typed).
    val d1 = Differ.diff(file, db, "id")
    assert(d1.toUpdate.count() == 1)
    // but float 20.0 vs float 20.0 is equal
    val file2 = Seq(("1", 20.0)).toDF("id", "v")
    val d2 = Differ.diff(file2, db, "id")
    assert(d2.toUpdate.count() == 0 && d2.toInsert.count() == 0 && d2.toDelete.count() == 0)
  }

  test("diff: null/empty pks are skipped on both sides") {
    val file = Seq((null.asInstanceOf[String], "x"), ("", "y"), ("1", "z"))
      .toDF("id", "v")
    val db = Seq((null.asInstanceOf[String], "x")).toDF("id", "v")
    val d = Differ.diff(file, db, "id")
    assert(d.toInsert.count() == 1)
    assert(d.toDelete.count() == 0)
  }

  test("pk validation: reason precedence and duplicates") {
    val df = Seq("ok1", "ok2", "dup", "dup", " pad", "tab\tx", null, "na")
      .toDF("pk")
    val got = PrimaryKeyValidator.classify(df, "pk")
      .groupBy(col(PrimaryKeyValidator.ReasonCol)).count()
      .as[(String, Long)].collect().toMap
    assert(got("valid") == 2)
    assert(got("duplicate") == 2)
    assert(got("invalid_format") == 2)
    assert(got("null_or_empty") == 2)
  }

  test("pk validation: strict mode throws with a reason rollup") {
    val df = Seq("a", "a").toDF("pk")
    val e = intercept[IllegalArgumentException] {
      PrimaryKeyValidator.validateStrict(df, "pk")
    }
    assert(e.getMessage.contains("duplicate=2"))
    // and a clean frame passes
    val r = PrimaryKeyValidator.validateStrict(Seq("a", "b").toDF("pk"), "pk")
    assert(r.isValid && r.total == 2)
  }
}
