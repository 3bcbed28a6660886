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
