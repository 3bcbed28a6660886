package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** Market-basket affinity: co-occurrence pair counting and PMI
  * association over a (basket, item) relation — the shapes behind
  * "frequently bought together" vs "both just common".
  *
  * Scale design: pair generation is quadratic in basket size, so a
  * single pathological basket (one customer buying 100k distinct
  * items) would emit 5·10^9 rows from one task. `maxBasket` caps each
  * basket to its smallest item ids BEFORE any array materializes via
  * the heap-bounded [[graft.plans.TopKPerKey]] operator, making the
  * per-task fan-out O(maxBasket²) regardless of skew. Pairs expand
  * array-side from one bounded basket array (never a self-join, which
  * would run the dedup+cap pipeline twice and shuffle four times);
  * the pair count is a partial-aggregated groupBy on the
  * high-cardinality (item1, item2) key.
  */
object Affinity {

  /** All x&lt;y combinations of the sorted, distinct `__items` array. */
  private val PairExpansion =
    """flatten(transform(__items,
      |  (x, i) -> transform(slice(__items, i + 2, size(__items)),
      |            y -> struct(x AS item1, y AS item2))))""".stripMargin

  /** One bounded, sorted item array per basket: distinct the relation,
    * cap each basket to its `maxBasket` smallest items (TopKPerKey:
    * per-key heaps map-side), collect — with no extra exchange, since
    * TopKPerKeyFinal preserves the basket clustering.
    */
  private def cappedBaskets(
      rel: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int): DataFrame = {
    val pairsRel = rel.select(col(basketCol), col(itemCol)).distinct()
    TopKPerKey.topk(pairsRel, Seq(basketCol), Seq(TopKPerKey.Asc(itemCol)), maxBasket)
      .groupBy(col(basketCol))
      .agg(sort_array(collect_list(col(itemCol))).as("__items"))
  }

  private def pairCounts(baskets: DataFrame, minCount: Long): DataFrame =
    baskets.select(explode(expr(PairExpansion)).as("p"))
      .groupBy(col("p.item1").as("item1"), col("p.item2").as("item2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)

  /** Shared SQL prelude: distinct relation + row_number-capped baskets
    * (the oracle twin of [[cappedBaskets]]).
    */
  private def cappedSql(src: String, basketCol: String, itemCol: String,
      maxBasket: Int): String =
    s"""rel AS (SELECT DISTINCT $basketCol, $itemCol FROM $src),
       |capped AS (SELECT $basketCol, $itemCol FROM (
       |    SELECT $basketCol, $itemCol,
       |      ROW_NUMBER() OVER (PARTITION BY $basketCol ORDER BY $itemCol) AS rn
       |    FROM rel) t WHERE rn <= $maxBasket)""".stripMargin

  /** Top-`k` item pairs by basket co-occurrence. Pairs are ordered
    * (item1 < item2); ties on count break by item ids. Returns
    * (item1, item2, n_baskets).
    */
  def coOccurrence(
      rel: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int,
      k: Int): DataFrame =
    pairCounts(cappedBaskets(rel, basketCol, itemCol, maxBasket), minCount = 1L)
      .withColumnRenamed("n_ab", "n_baskets")
      .orderBy(col("n_baskets").desc, col("item1"), col("item2"))
      .limit(k)

  /** Pointwise mutual information of co-occurring item pairs:
    * `pmi = ln(n_ab * N / (n_a * n_b))` over basket probabilities,
    * keeping pairs with `n_ab >= minCount`, top-`k` by pmi. PMI
    * separates genuinely associated pairs from pairs that co-occur
    * only because both items are popular.
    *
    * All marginals count the SAME capped baskets, so probabilities
    * stay consistent; the basket arrays are checkpointed once (lazily
    * — the first action materializes them) so the dedup+cap upstream
    * runs once, not once per consumer. The blocks stay pinned for the
    * session; long-lived sessions release them via
    * `graftbridge.unpersistCheckpointed` after their action.
    */
  def pmiPairs(
      rel: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int,
      minCount: Long,
      k: Int): DataFrame = {
    val baskets = cappedBaskets(rel, basketCol, itemCol, maxBasket)
      .localCheckpoint(false)
    val nBaskets = baskets.agg(count(lit(1)).as("__nb"))
    val itemCounts = baskets
      .select(explode(col("__items")).as(itemCol))
      .groupBy(col(itemCol)).agg(count(lit(1)).as("__na"))
    pairCounts(baskets, minCount)
      .join(itemCounts.withColumnsRenamed(Map(itemCol -> "item1", "__na" -> "__n1")), "item1")
      .join(itemCounts.withColumnsRenamed(Map(itemCol -> "item2", "__na" -> "__n2")), "item2")
      .crossJoin(broadcast(nBaskets))
      // marginal product in double: the long product overflows (and
      // throws, under ANSI) once n1*n2 passes 2^63 — reachable at scale
      .select(col("item1"), col("item2"), col("n_ab"),
        round(log(col("n_ab").cast("double") * col("__nb") /
          (col("__n1").cast("double") * col("__n2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("item1"), col("item2"))
      .limit(k)
  }

  /** DuckDB SQL equivalent of [[pmiPairs]]. */
  def pmiPairsSql(src: String, basketCol: String, itemCol: String,
      maxBasket: Int, minCount: Long, k: Int): String =
    s"""WITH ${cappedSql(src, basketCol, itemCol, maxBasket)},
       |nb AS (SELECT COUNT(DISTINCT $basketCol) AS nb FROM capped),
       |ic AS (SELECT $itemCol, COUNT(*) AS na FROM capped GROUP BY 1),
       |pc AS (SELECT a.$itemCol AS item1, b.$itemCol AS item2, COUNT(*) AS n_ab
       |       FROM capped a JOIN capped b
       |         ON a.$basketCol = b.$basketCol AND a.$itemCol < b.$itemCol
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $minCount)
       |SELECT item1, item2, n_ab,
       |  round(ln(CAST(n_ab AS DOUBLE) * nb.nb / (CAST(i1.na AS DOUBLE) * i2.na)), 6) AS pmi
       |FROM pc
       |JOIN ic i1 ON pc.item1 = i1.$itemCol
       |JOIN ic i2 ON pc.item2 = i2.$itemCol
       |CROSS JOIN nb
       |ORDER BY pmi DESC, item1, item2 LIMIT $k""".stripMargin

  /** DuckDB SQL equivalent of [[coOccurrence]]. */
  def coOccurrenceSql(src: String, basketCol: String, itemCol: String,
      maxBasket: Int, k: Int): String =
    s"""WITH ${cappedSql(src, basketCol, itemCol, maxBasket)}
       |SELECT a.$itemCol AS item1, b.$itemCol AS item2, COUNT(*) AS n_baskets
       |FROM capped a JOIN capped b
       |  ON a.$basketCol = b.$basketCol AND a.$itemCol < b.$itemCol
       |GROUP BY 1, 2
       |ORDER BY n_baskets DESC, item1, item2 LIMIT $k""".stripMargin
}
