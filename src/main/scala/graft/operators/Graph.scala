package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics. Companion to [[Dedup.dupClusters]]
  * (connected components): where components tell you WHICH rows form a
  * duplicate/linkage cluster, PageRank ranks nodes by structural
  * importance — canonical-record election, influential-item detection,
  * crawl-frontier prioritization.
  *
  * Determinism at oracle precision: ranks are INTEGER micro-units
  * (1.0 == 10^9), every per-edge contribution is an integer `div`, and
  * every aggregation is an integer sum — no float ever enters, so the
  * engines' reduction orders cannot disagree (same scheme as the
  * k-means micro-unit centroids, q76).
  *
  * Scale shape: the adjacency (edge + source degree) is built once and
  * checkpointed; each Lloyd-style iteration is ONE equi-join of the
  * adjacency with the current rank vector (both keyed on the node id)
  * plus one partial-aggregated groupBy on the destination — the
  * standard distributed PageRank data layout. Iterations are a fixed,
  * small count (the operator is a ranking signal, not a convergence
  * solver).
  */
object Graph {

  /** Micro-units per unit of rank. */
  val Scale: Long = 1000000000L

  /** `iters` rounds of damped PageRank (d = 0.85) over the UNDIRECTED
    * graph induced by `edges`, returning the `k` highest-ranked nodes
    * as (node, r) with r in micro-units. Every node keeps a base
    * (1-d) mass; contributions split a node's rank evenly over its
    * neighbors (integer div — the sub-micro remainder is dropped on
    * both engines identically).
    */
  def pageRankMicro(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      k: Int): DataFrame = {
    require(iters >= 1 && iters <= 8, "iters must be in [1,8]")
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // adjacency with source degree, materialized once for all rounds
    val adj = sym.join(deg, "src").localCheckpoint(false)
    val base = 15L * Scale / 100L
    var ranks = deg.select(col("src").as("node"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val contribs = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
      // damping without overflow: 85*(s div 100) + (85*(s%100)) div 100
      // == (85*s) div 100 for s >= 0, but never exceeds Long range —
      // a naive 85*s throws (ANSI) once a hub's inbound mass passes
      // Long.MaxValue/85, a reachable degree at full scale
      ranks = contribs.groupBy(col("dst"))
        .agg(sum(col("c")).as("__s"))
        .select(col("dst").as("node"),
          (lit(base) + expr("85 * (__s div 100) + (85 * (__s % 100)) div 100")).as("r"))
    }
    ranks.orderBy(col("r").desc, col("node")).limit(k)
  }

  /** DuckDB SQL equivalent of [[pageRankMicro]]: the iteration chain
    * unrolled as CTEs (r0 -> c1 -> r1 -> ...), `//` mirroring Spark's
    * `div` (identical on the positive values ranks always are).
    * `edgesSql` must yield columns (src, dst).
    */
  def pageRankMicroSql(edgesSql: String, iters: Int, k: Int): String = {
    val base = 15L * Scale / 100L
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT sym.dst, (r${i - 1}.r // deg.deg) AS c
         |  FROM sym JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = sym.src),
         |r$i AS (SELECT dst AS node,
         |    $base + 85 * (SUM(c) // 100) + (85 * (SUM(c) % 100)) // 100 AS r
         |  FROM c$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesSql),
       |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST($Scale AS BIGINT) AS r FROM deg),
       |$steps
       |SELECT node, CAST(r AS BIGINT) AS r FROM r$iters
       |ORDER BY r DESC, node LIMIT $k""".stripMargin
  }
}
