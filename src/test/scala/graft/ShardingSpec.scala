package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sharding, TextAnalysis}

/** Unit + invariant checks for the shard-export operators (q133). */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs = {
    import spark.implicits._
    (0L until 200L).map(i => (i, s"tok$i " * (1 + (i % 7).toInt)))
      .toDF("doc_id", "text")
  }

  test("shardAssign is deterministic, in-range, and salt-sensitive") {
    val a = Sharding.shardAssign(docs, "doc_id", 8)
    val again = Sharding.shardAssign(docs, "doc_id", 8)
    val ids = a.select("shard").distinct().collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf((0L until 8L).toSet))
    assert(ids.size > 1, "200 docs over 8 shards must not collapse to one")
    assert(a.except(again).isEmpty && again.except(a).isEmpty)
    val other = Sharding.shardAssign(docs, "doc_id", 8, salt = "other")
    assert(a.join(other.withColumnRenamed("shard", "s2"), "doc_id")
      .filter(col("shard") =!= col("s2")).count() > 0,
      "a different salt must move at least one doc")
  }

  test("shardManifest conserves corpus totals and shares sum to 1") {
    val m = Sharding.shardManifest(docs, "doc_id", "text", nShards = 8).collect()
    assert(m.length == 8 || m.length == m.map(_.getLong(0)).distinct.length)
    assert(m.map(_.getLong(1)).sum == 200L)
    val expTokens = docs
      .agg(sum(TextAnalysis.tokenCount(col("text")))).collect()(0).getLong(0)
    val expBytes = docs
      .agg(sum(octet_length(col("text")).cast("long"))).collect()(0).getLong(0)
    assert(m.map(_.getLong(2)).sum == expTokens)
    assert(m.map(_.getLong(3)).sum == expBytes)
    assert(math.abs(m.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    assert(math.abs(m.map(_.getDouble(5)).sum - 1.0) < 1e-4)
    // balance averages to ~1 by construction
    assert(math.abs(m.map(_.getDouble(6)).sum / m.length - 1.0) < 1e-4)
  }

  test("writeSharded round-trips and partitions agree with shardAssign") {
    val out = Files.createTempDirectory("graft-shards").toString
    Sharding.writeSharded(docs, "doc_id", 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 200L)
    val expected = Sharding.shardAssign(docs, "doc_id", 4)
      .select(col("doc_id"), col("shard"))
    val got = back.select(col("doc_id"), col("shard").cast("long").as("shard"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("rendezvous rebalance: minimal movement — moved docs land only on added shards") {
    val per = Sharding.rendezvousAssign(
        Sharding.rendezvousAssign(docs, "doc_id", 4, outCol = "old_shard"),
        "doc_id", 6, outCol = "new_shard")
      .select("doc_id", "old_shard", "new_shard").collect()
    assert(per.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 4))
    assert(per.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 6))
    val moved = per.filter(r => r.getLong(1) != r.getLong(2))
    assert(moved.nonEmpty, "a 4 -> 6 grow must move an expected third of docs")
    assert(moved.forall(_.getLong(2) >= 4),
      "HRW minimal-movement law: moved docs go to ADDED shards only")
    // expected moved fraction (M-N)/M = 1/3 of 200 docs; allow wide slack
    assert(moved.length > 30 && moved.length < 110, s"moved ${moved.length}/200")
    // the report aggregates the same assignment
    val rep = Sharding.rebalanceReport(docs, "doc_id", 4, 6).collect()
    assert(rep.map(_.getLong(2)).sum == 200L)
    assert(rep.filter(_.getBoolean(3)).map(_.getLong(2)).sum == moved.length.toLong)
  }
}
