package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types.{StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Readers

class ReadersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpFile(name: String, content: String): String = {
    val dir: Path = Files.createTempDirectory("graft-readers")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("csv: header, projection silently drops missing columns") {
    val p = tmpFile("a.csv", "id,name,email\n1,alice,a@x\n2,bob,b@x\n")
    val df = Readers.csv(spark, p, columns = Seq("id", "email", "ghost"))
    assert(df.columns.toSeq == Seq("id", "email")) // ghost silently dropped
    assert(df.count() == 2)
  }

  test("csv: custom delimiter") {
    val p = tmpFile("b.csv", "id;name\n1;alice\n")
    val df = Readers.csv(spark, p, delimiter = ";")
    assert(df.columns.toSeq == Seq("id", "name"))
  }

  test("csv: RFC3339 columns are promoted to timestamps") {
    val p = tmpFile("c.csv",
      "id,at,label\n1,2023-12-25T15:30:45Z,x\n2,2023-12-25T16:30:45+09:00,y\n")
    val df = Readers.csv(spark, p)
    assert(df.schema("at").dataType == TimestampType)
    assert(df.schema("label").dataType == StringType)
  }

  test("xml: rowTag records, projection, RFC3339 promotion, dispatch") {
    val p = tmpFile("r.xml",
      """<rows>
        |  <row><id>1</id><name>alice</name><at>2023-12-25T15:30:45Z</at></row>
        |  <row><id>2</id><name>bob</name><at>2023-12-26T10:00:00Z</at></row>
        |</rows>""".stripMargin)
    val df = Readers.xml(spark, p, rowTag = "row")
    assert(df.count() == 2)
    assert(df.schema("at").dataType == TimestampType)
    val e = intercept[IllegalArgumentException] {
      Readers.xml(spark, p, rowTag = "row", columns = Seq("id", "ghost"))
    }
    assert(e.getMessage.contains("ghost"))
    // extension dispatch reaches the XML reader
    assert(Readers.forPath(spark, p).count() == 2)
  }

  test("json: array of objects; missing requested key errors") {
    val p = tmpFile("d.json",
      """[{"id": 1, "name": "alice"}, {"id": 2, "name": "bob"}]""")
    val df = Readers.json(spark, p, columns = Seq("id", "name"))
    assert(df.count() == 2)
    val e = intercept[IllegalArgumentException] {
      Readers.json(spark, p, columns = Seq("id", "email"))
    }
    assert(e.getMessage.contains("email"))
  }

  test("json: record-level missing key errors; explicit null does not") {
    // mirrors reference main_test.go:327-338 / loader.go:185-193: the
    // key exists in the file's union schema but SOME records lack it
    val p = tmpFile("m.json",
      """[{"id": 1, "name": "alice", "email": "a@x"},
        | {"id": 2, "name": "bob"},
        | {"id": 3, "name": "carol", "email": "c@x"}]""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      Readers.json(spark, p, columns = Seq("id", "name", "email"))
    }
    assert(e.getMessage.contains("record 1") &&
      e.getMessage.contains("missing required key 'email'"))
    // columns not requesting the partial key load fine
    assert(Readers.json(spark, p, columns = Seq("id", "name")).count() == 3)
    // an explicit JSON null is PRESENT (reference: jsonObj[col] ok=true)
    val pn = tmpFile("n.json",
      """[{"id": 1, "email": "a@x"}, {"id": 2, "email": null}]""")
    val dfn = Readers.json(spark, pn, columns = Seq("id", "email"))
    assert(dfn.count() == 2)
  }

  test("json: auto-detect uses first record's sorted keys; later-record gap errors") {
    // reference loader.go:174-182: actualColumns = first object's keys
    // (sorted); record 1 lacking one of those keys errors, while a key
    // appearing only in later records is silently dropped
    val p = tmpFile("f.json",
      """[{"b": 1, "a": "x"}, {"a": "y", "b": 2, "extra": true}]""")
    val df = Readers.json(spark, p)
    assert(df.columns.toSeq == Seq("a", "b")) // sorted, no "extra"
    val pBad = tmpFile("g.json", """[{"a": 1, "b": 2}, {"a": 3}]""")
    val e = intercept[IllegalArgumentException](Readers.json(spark, pBad))
    assert(e.getMessage.contains("record 1") &&
      e.getMessage.contains("missing required key 'b'"))
  }

  test("json: empty array loads as empty result") {
    val p = tmpFile("e.json", "[]")
    assert(Readers.json(spark, p).count() == 0)
  }

  test("json: single top-level object gets the same per-record check") {
    // the array-schema parse yields null for an object file; without
    // the object fallback the presence check silently skipped it
    val p = tmpFile("o.json", """{"id": 1, "name": "alice"}""")
    assert(Readers.json(spark, p, columns = Seq("id", "name")).count() == 1)
    val e = intercept[IllegalArgumentException] {
      Readers.json(spark, p, columns = Seq("id", "email"))
    }
    assert(e.getMessage.contains("email"))
    // auto-detect takes the object's own sorted keys
    assert(Readers.json(spark, p).columns.toSeq == Seq("id", "name"))
  }

  test("parquet dispatch reads with projection; partitioned jdbc read works") {
    import java.sql.DriverManager
    val dir = Files.createTempDirectory("graft-pq")
    val p = s"$dir/part.parquet"
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
      .write.parquet(p)
    val df = Readers.forPath(spark, p, columns = Seq("id", "score"))
    assert(df.columns.toSeq == Seq("id", "score") && df.count() == 2)
    intercept[IllegalArgumentException](
      Readers.forPath(spark, p, columns = Seq("ghost")))

    val db = graft.config.DbConfig("jdbc:derby:memory:partdb;create=true")
    val c = DriverManager.getConnection(db.url)
    c.createStatement().executeUpdate("CREATE TABLE pt (id INT PRIMARY KEY, v INT)")
    c.createStatement().executeUpdate(
      "INSERT INTO pt VALUES " + (1 to 50).map(i => s"($i, ${i * 10})").mkString(", "))
    c.close()
    val jdbcDf = graft.sinks.JdbcSyncWriter.readTablePartitioned(
      spark, db, "pt", "id", 1, 50, 4)
    assert(jdbcDf.rdd.getNumPartitions == 4)
    assert(jdbcDf.count() == 50)
  }

  test("orc round-trip: dispatch, projection, missing-column error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("t.orc").toString
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
      .write.mode("overwrite").orc(dir)
    val back = Readers.forPath(spark, dir, columns = Seq("id", "v"))
    assert(back.columns.toSeq == Seq("id", "v"))
    assert(back.count() == 2)
    val e = intercept[IllegalArgumentException] {
      Readers.forPath(spark, dir, columns = Seq("nope"))
    }
    assert(e.getMessage.contains("missing column"))
  }

  test("extension dispatch rejects unknown formats") {
    val e = intercept[IllegalArgumentException] {
      Readers.forPath(spark, "/tmp/data.xlsx")
    }
    assert(e.getMessage.contains("unsupported file format"))
  }
}
