package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SnapshotStamp

/** Round-14 extension: corpus snapshot stamps — the staleness guard
  * stored artifacts write at build time and deploy paths verify at
  * read time (q184).
  */
class SnapshotStampSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(ids: Long*) = ids.map(i => (i, s"doc $i")).toDF("id", "text")

  test("stamp is order- and partitioning-independent") {
    val a = SnapshotStamp.stamp(corpus(1L, 2L, 3L), "id").collect()(0)
    val b = SnapshotStamp.stamp(corpus(3L, 1L, 2L).repartition(7), "id").collect()(0)
    assert(a.getLong(0) == 3L)
    assert(b.getLong(0) == 3L)
    assert(a.getString(1) == b.getString(1))
  }

  test("empty corpus stamps (0, 0) rather than null") {
    val r = SnapshotStamp.stamp(corpus(), "id").collect()(0)
    assert(r.getLong(0) == 0L)
    assert(r.getString(1) == "0")
  }

  test("fresh round-trip; any insert, delete, or id change trips the guard") {
    val dir = Files.createTempDirectory("stamp-spec").toString
    SnapshotStamp.write(corpus(1L, 2L, 3L), "id", s"$dir/stamp")
    assert(SnapshotStamp.isFresh(corpus(1L, 2L, 3L), "id", s"$dir/stamp"))
    // delete
    assert(!SnapshotStamp.isFresh(corpus(1L, 2L), "id", s"$dir/stamp"))
    // insert
    assert(!SnapshotStamp.isFresh(corpus(1L, 2L, 3L, 4L), "id", s"$dir/stamp"))
    // same count, one id changed
    assert(!SnapshotStamp.isFresh(corpus(1L, 2L, 4L), "id", s"$dir/stamp"))
  }

  test("assertFresh names the artifact and both stamps on staleness") {
    val dir = Files.createTempDirectory("stamp-stale").toString
    SnapshotStamp.write(corpus(1L, 2L), "id", s"$dir/stamp")
    SnapshotStamp.assertFresh(corpus(1L, 2L), "id", s"$dir/stamp") // no throw
    val e = intercept[IllegalArgumentException] {
      SnapshotStamp.assertFresh(corpus(1L, 2L, 3L), "id", s"$dir/stamp")
    }
    assert(e.getMessage.contains("stale artifact stamp"))
    assert(e.getMessage.contains(s"$dir/stamp"))
  }

  test("salt separates stamps of identical id sets") {
    val a = SnapshotStamp.stamp(corpus(1L, 2L), "id", salt = "a:").collect()(0)
    val b = SnapshotStamp.stamp(corpus(1L, 2L), "id", salt = "b:").collect()(0)
    assert(a.getString(1) != b.getString(1))
  }
}
