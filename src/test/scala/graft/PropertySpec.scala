package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Differ
import graft.operators.{AsOfJoin, Sessionize}

/** Property-based checks of the relational operators against naive
  * in-memory reference computations on random inputs. Few cases each
  * (every case runs Spark jobs), but the inputs cover duplicates,
  * empties, and collisions that hand-written examples miss.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withWorkers(1)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("diff partitions keys exactly like set algebra") {
    import spark.implicits._
    val genSide = Gen.mapOf(Gen.zip(Gen.choose(0, 15), Gen.choose(0, 2)))
    check("diff", Prop.forAll(genSide, genSide) { (fileM, dbM) =>
      val file = fileM.toSeq.map { case (k, v) => (k.toString, v) }
      val db = dbM.toSeq.map { case (k, v) => (k.toString, v) }
      val d = Differ.diff(file.toDF("id", "v"), db.toDF("id", "v"), "id")
      val ins = d.toInsert.select("id").as[String].collect().toSet
      val upd = d.toUpdate.select("id").as[String].collect().toSet
      val del = d.toDelete.select("id").as[String].collect().toSet
      val expIns = fileM.keySet.diff(dbM.keySet).map(_.toString)
      val expDel = dbM.keySet.diff(fileM.keySet).map(_.toString)
      val expUpd = fileM.keySet.intersect(dbM.keySet)
        .filter(k => fileM(k) != dbM(k)).map(_.toString)
      ins == expIns && del == expDel && upd == expUpd
    })
  }

  test("asof backward equals the naive per-row maximum") {
    import spark.implicits._
    val genLeft = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val genRight = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L), Gen.choose(100L, 999L)))
    check("asof", Prop.forAll(genLeft, genRight) { (l0, r0) =>
      val l = l0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      // unique (key, time) on the right: keep max payload
      val r = r0.groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq
      val left = l.toDF("lid", "k", "t")
      val right = r.toDF("rk", "rt", "pay")
      val got = AsOfJoin.backward(left, right, "k", "rk", "t", "rt",
          Seq("pay"), inner = false)
        .select("lid", "pay").collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val exp = l.map { case (lid, k, t) =>
        val cands = r.filter(x => x._1 == k && x._2 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(x => (x._2, x._3))._3))
      }.toMap
      got == exp
    })
  }

  test("sessionize session count equals the gap count + 1 per key") {
    import spark.implicits._
    val genEvents = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 2000L)))
    check("sessionize", Prop.forAll(genEvents) { ev0 =>
      val ev = ev0.distinct.zipWithIndex.map { case ((k, s), i) =>
        (i.toLong, k, new java.sql.Timestamp(s * 1000L))
      }
      val gap = 300L
      val got = Sessionize.sessions(ev.toDF("event_id", "k", "ts"), "k", "ts", gap, "event_id")
        .groupBy("k").count().as[(Long, Long)].collect().toMap
      val exp = ev.groupBy(_._2).map { case (k, es) =>
        val times = es.map(_._3.getTime / 1000L).sorted
        k -> (1L + times.zip(times.tail).count { case (a, b) => b - a > gap })
      }
      got == exp
    })
  }
}
