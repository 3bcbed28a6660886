package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** Market-basket affinity: co-occurrence pair counting over a
  * (basket, item) relation — the self-join shape behind
  * "frequently bought together".
  *
  * Scale design: pair generation is quadratic in basket size, so a
  * single pathological basket (one customer buying 100k distinct
  * items) would emit 5·10^9 rows from one task. `maxBasket` caps each
  * basket to its smallest item ids BEFORE the self-join via the
  * heap-bounded [[graft.plans.TopKPerKey]] operator, making the
  * per-task output O(maxBasket²) regardless of skew. The join itself
  * is an equi-join on the basket id — co-partitioned, no broadcast
  * needed — and the pair count is a partial-aggregated groupBy on the
  * high-cardinality (item1, item2) key.
  */
object Affinity {

  /** Top-`k` item pairs by basket co-occurrence. Pairs are ordered
    * (item1 < item2); ties on count break by item ids. Returns
    * (item1, item2, n_baskets).
    *
    * Shape: NOT a self-join (which would run the dedup+cap pipeline
    * twice and shuffle four times) — the capped basket is collected
    * into one bounded array per basket (no extra shuffle: TopKPerKey's
    * exchange already clusters by basket) and the x&lt;y combinations
    * are expanded array-side, then pair-counted. Two shuffles total.
    */
  def coOccurrence(
      rel: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int,
      k: Int): DataFrame = {
    val pairs = rel.select(col(basketCol), col(itemCol)).distinct()
    val capped = TopKPerKey.topk(pairs, Seq(basketCol),
      Seq(TopKPerKey.Asc(itemCol)), maxBasket)
    val baskets = capped.groupBy(col(basketCol))
      .agg(sort_array(collect_list(col(itemCol))).as("__items"))
    val combos = baskets.select(explode(expr(
      """flatten(transform(__items,
        |  (x, i) -> transform(slice(__items, i + 2, size(__items)),
        |            y -> struct(x AS item1, y AS item2))))""".stripMargin)).as("p"))
    combos.groupBy(col("p.item1").as("item1"), col("p.item2").as("item2"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(col("n_baskets").desc, col("item1"), col("item2"))
      .limit(k)
  }

  /** Pointwise mutual information of co-occurring item pairs:
    * `pmi = ln(n_ab * N / (n_a * n_b))` over basket probabilities,
    * keeping pairs with `n_ab >= minCount`, top-`k` by pmi. PMI
    * separates genuinely associated pairs from pairs that co-occur
    * only because both items are popular — the association measure
    * behind "bought together" vs "both just common".
    *
    * Same bounded pipeline as [[coOccurrence]] (all marginals count
    * the SAME capped baskets, so probabilities stay consistent); the
    * marginal join keys on item1/item2 and N is a broadcast scalar.
    */
  def pmiPairs(
      rel: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int,
      minCount: Long,
      k: Int): DataFrame = {
    val pairsRel = rel.select(col(basketCol), col(itemCol)).distinct()
    val capped = TopKPerKey.topk(pairsRel, Seq(basketCol),
      Seq(TopKPerKey.Asc(itemCol)), maxBasket)
    // N, the item marginals, and the pair counts all derive from the
    // basket arrays; checkpoint them once so the dedup+cap pipeline
    // (the expensive upstream) runs once, not once per consumer. The
    // blocks stay pinned for the session — long-lived sessions release
    // them via graftbridge.unpersistCheckpointed after their action.
    val baskets = capped.groupBy(col(basketCol))
      .agg(sort_array(collect_list(col(itemCol))).as("__items"))
      .localCheckpoint(true)
    val nBaskets = baskets.agg(count(lit(1)).as("__nb"))
    val itemCounts = baskets
      .select(explode(col("__items")).as(itemCol))
      .groupBy(col(itemCol)).agg(count(lit(1)).as("__na"))
    val pairCounts = baskets.select(explode(expr(
      """flatten(transform(__items,
        |  (x, i) -> transform(slice(__items, i + 2, size(__items)),
        |            y -> struct(x AS item1, y AS item2))))""".stripMargin)).as("p"))
      .groupBy(col("p.item1").as("item1"), col("p.item2").as("item2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairCounts
      .join(itemCounts.withColumnsRenamed(Map(itemCol -> "item1", "__na" -> "__n1")), "item1")
      .join(itemCounts.withColumnsRenamed(Map(itemCol -> "item2", "__na" -> "__n2")), "item2")
      .crossJoin(broadcast(nBaskets))
      .select(col("item1"), col("item2"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("__nb") /
          (col("__n1") * col("__n2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("item1"), col("item2"))
      .limit(k)
  }

  /** DuckDB SQL equivalent of [[pmiPairs]]. */
  def pmiPairsSql(src: String, basketCol: String, itemCol: String,
      maxBasket: Int, minCount: Long, k: Int): String =
    s"""WITH rel AS (SELECT DISTINCT $basketCol, $itemCol FROM $src),
       |capped AS (SELECT $basketCol, $itemCol FROM (
       |    SELECT $basketCol, $itemCol,
       |      ROW_NUMBER() OVER (PARTITION BY $basketCol ORDER BY $itemCol) AS rn
       |    FROM rel) t WHERE rn <= $maxBasket),
       |nb AS (SELECT COUNT(DISTINCT $basketCol) AS nb FROM capped),
       |ic AS (SELECT $itemCol, COUNT(*) AS na FROM capped GROUP BY 1),
       |pc AS (SELECT a.$itemCol AS item1, b.$itemCol AS item2, COUNT(*) AS n_ab
       |       FROM capped a JOIN capped b
       |         ON a.$basketCol = b.$basketCol AND a.$itemCol < b.$itemCol
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $minCount)
       |SELECT item1, item2, n_ab,
       |  round(ln(CAST(n_ab AS DOUBLE) * nb.nb / (i1.na * i2.na)), 6) AS pmi
       |FROM pc
       |JOIN ic i1 ON pc.item1 = i1.$itemCol
       |JOIN ic i2 ON pc.item2 = i2.$itemCol
       |CROSS JOIN nb
       |ORDER BY pmi DESC, item1, item2 LIMIT $k""".stripMargin

  /** DuckDB SQL equivalent of [[coOccurrence]]. */
  def coOccurrenceSql(src: String, basketCol: String, itemCol: String,
      maxBasket: Int, k: Int): String =
    s"""WITH rel AS (SELECT DISTINCT $basketCol, $itemCol FROM $src),
       |capped AS (SELECT $basketCol, $itemCol FROM (
       |    SELECT $basketCol, $itemCol,
       |      ROW_NUMBER() OVER (PARTITION BY $basketCol ORDER BY $itemCol) AS rn
       |    FROM rel) t WHERE rn <= $maxBasket)
       |SELECT a.$itemCol AS item1, b.$itemCol AS item2, COUNT(*) AS n_baskets
       |FROM capped a JOIN capped b
       |  ON a.$basketCol = b.$basketCol AND a.$itemCol < b.$itemCol
       |GROUP BY 1, 2
       |ORDER BY n_baskets DESC, item1, item2 LIMIT $k""".stripMargin
}
