package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey
import graft.plans.TopKPerKey.{Asc, Desc}

class PlansSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("topk-per-key matches the window-function reference") {
    val df = (1 to 5000).map(i => (i % 37, i * 31 % 1009, i)).toDF("k", "v", "id")
      .repartition(7)
    val got = TopKPerKey.topk(df, Seq("k"), Seq(Desc("v"), Asc("id")), 3)
      .select("k", "rank", "v", "id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("k", "rank", "v", "id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
  }

  test("topk-per-key plans partial heaps before the exchange") {
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "v").repartition(4)
    val top = TopKPerKey.topk(df, Seq("k"), Seq(Desc("v")), 2)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"no partial node in:\n$plan")
    assert(plan.contains("TopKPerKeyFinal"), s"no final node in:\n$plan")
    // partial must sit below the exchange
    val pPartial = plan.indexOf("TopKPerKeyPartial")
    val pExchange = plan.indexOf("Exchange")
    assert(pExchange >= 0 && pExchange < pPartial,
      s"exchange not between final and partial:\n$plan")
  }

  test("topk-per-key: k larger than group size emits whole groups ranked") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopKPerKey.topk(df, Seq("k"), Seq(Desc("v")), 5)
      .select("k", "rank", "v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((1, 1L, 20), (1, 2L, 10), (2, 1L, 5)))
  }

  test("topk-per-key partial flush path preserves exact results") {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    // run the partial pass with a tiny flush threshold directly: the
    // flushed output may contain more than k rows per key, but the
    // true top-k must survive in it
    val df = (1 to 500).map(i => (i % 7, i * 13 % 101, i)).toDF("k", "v", "id")
    val plan = df.queryExecution.executedPlan
    val attrs = plan.output
    val keyAttr = attrs.find(_.name == "k").get
    val vAttr = attrs.find(_.name == "v").get
    val rows = plan.executeCollect().iterator
    val out = graft.plans.TopKPerKeyExec.partialTopK(
        rows, Seq(keyAttr), Seq(SortOrder(vAttr, Ascending)), 3, attrs, flushRows = 8)
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    // per key, the 3 smallest v values overall must all be present
    val expected = (1 to 500).map(i => (i % 7, i * 13 % 101))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.take(3).toSet }
    expected.foreach { case (k, top3) =>
      val got = out.filter(_._1 == k).map(_._2).toSet
      assert(top3.subsetOf(got), s"key $k lost top values: got $got want ⊇ $top3")
    }
  }

  test("prefix sum handles decimal values through the widened sum type") {
    import graft.operators.PrefixSum
    val df = (1 to 100).map(i => (i.toLong, BigDecimal(i) / 100))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("decimal(10,2)").as("v"))
      .repartition(5)
    val got = PrefixSum.runningSum(df, Seq(col("id")), "v", "cum")
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(got(100L).compareTo(new java.math.BigDecimal("50.50")) == 0)
    assert(got(3L).compareTo(new java.math.BigDecimal("0.06")) == 0)
  }

  test("prefix sum plans per-partition windows, never a global orderBy window") {
    import graft.operators.PrefixSum
    val df = (1 to 1000).map(i => (i.toLong, i.toLong % 7)).toDF("id", "v")
      .repartition(4)
    val cum = PrefixSum.runningSum(df, Seq(col("id")), "v")
    cum.collect()
    val plan = cum.queryExecution.executedPlan.toString
    // the window must be keyed by the internal partition id — an
    // unkeyed window ("Window [...] ORDER BY ..." with no partition
    // spec) would funnel everything through one task
    assert(plan.contains("windowspecdefinition(__pid"),
      s"window not partitioned by __pid:\n$plan")
  }

  test("topk-per-key consumer grouping by the same key adds no exchange") {
    val df = (1 to 2000).map(i => (i % 40, i)).toDF("k", "v").repartition(4)
    val top = TopKPerKey.topk(df, Seq("k"), Seq(Asc("v")), 5)
    val regrouped = top.groupBy("k").agg(collect_list("v").as("vs"))
    regrouped.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // only the final section. Exactly the exchanges BELOW the final
    // node (repartition + topk clustering) may appear; the
    // collect_list agg must reuse the clustering.
    val plan = regrouped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nEx = "Exchange".r.findAllIn(plan).length
    assert(nEx == 2, s"expected 2 exchanges (repartition + topk), got $nEx in:\n$plan")
  }

  test("multi-quantile cutpoints plan one pass — no percentile_disc buffers") {
    import graft.operators.RobustStats
    val df = (1 to 5000).map(i => i.toDouble).toDF("v")
    val cuts = RobustStats.discCutpoints(df, "v", Seq(1, 2, 3), 4)
    val row = cuts.collect().head
    assert((0 to 2).map(row.getDouble) == Seq(1250.0, 2500.0, 3750.0))
    val plan = cuts.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_disc"), s"buffered percentile in:\n$plan")
    // the prefix-sum window must run per range-partition (__pid key),
    // never as an unpartitioned global window (the final 1-row max
    // reduce IS a SinglePartition exchange — that one is fine)
    assert(plan.contains("windowspecdefinition(__pid"),
      s"prefix-sum window not partitioned by __pid in:\n$plan")
    assert(!plan.contains("windowspecdefinition(__v"),
      s"global-order window in:\n$plan")
  }

  test("kmeans assignment plans as projection only — no join, no window") {
    import graft.operators.Similarity
    val df = (0 until 50)
      .map(i => (i.toLong, Array.tabulate(4)(d => (i * 7 + d) % 13 / 13.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 4, iters = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment should not join:\n$plan")
    assert(!plan.contains("Window"), s"assignment should not use a window:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment should not shuffle:\n$plan")
  }
}
