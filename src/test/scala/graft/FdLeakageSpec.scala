package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profiler, Sampling}

/** Round-4 extensions: functional-dependency discovery (q125) and the
  * leakage-safe cluster-aware split (q126).
  */
class FdLeakageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("functionalDependencies: holds/fails per ordered pair, null is a value") {
    val df = Seq(
      (Some(1), Some("x"), "A"), (Some(2), Some("x"), "A"),
      (Some(3), Some("y"), "B"), (Some(4), None, "A"))
      .toDF("id", "grp", "seg")
    val got = Profiler.functionalDependencies(df, Seq("id", "grp", "seg"))
      .select("col_a", "col_b", "n_lhs", "n_pairs", "fd_holds")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq

    assert(got == Seq(
      ("grp", "id", 3L, 4L, false),
      ("grp", "seg", 3L, 3L, true),
      ("id", "grp", 4L, 4L, true),
      ("id", "seg", 4L, 4L, true),
      ("seg", "grp", 2L, 3L, false), // the null-grp row breaks A->x
      ("seg", "id", 2L, 4L, false)))
  }

  test("leakageSafeSplit: cluster members always share a side") {
    val docs = (1L to 4L).map(i => Tuple1(i)).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = Sampling.leakageSafeSplit(docs, clusters, "doc_id",
        Seq("a" -> 0.5, "b" -> 0.5))
      .join(clusters, "doc_id")
      .as[(Long, String, Long)].collect().toSeq
    val byDoc = got.map(r => r._1 -> r._2).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L))
    assert(byDoc(1L) == byDoc(2L)) // same cluster -> same side, always
    assert(got.forall(r => r._2 == "a" || r._2 == "b"))
    // no cluster straddles splits
    val leaky = got.groupBy(_._3).values.count(g => g.map(_._2).distinct.size > 1)
    assert(leaky == 0)
  }
}
