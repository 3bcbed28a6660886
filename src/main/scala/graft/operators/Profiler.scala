package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: per-column health stats (row/null/distinct
  * counts, min/max rendered as strings), returned as a tall
  * (column, stat...) frame.
  *
  * Two column-pruned scans, all codegen'd hash aggregation:
  *
  *   1. count/min/max for every column in ONE aggregate (min/max are
  *      computed on the native type, then rendered to string — casting
  *      first would order numerics lexicographically);
  *   2. distinct counts from a tall (column, value-as-string) explode,
  *      `distinct` + per-column count — a shuffle keyed by (column,
  *      value) that distributes across the cluster, unlike the
  *      single-aggregate `countDistinct` form whose Expand + 3x
  *      SortAggregate plan funnels 5x the rows through non-codegen
  *      `first()` aggregates into one partition. The string render is
  *      injective per column type, so distinct counts match the native
  *      ones.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq

    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"))
    }
    val basic = row.select(explode(array(structs: _*)).as("p")).select("p.*")

    val tallStructs = cols.map { c =>
      // the render must be injective AND agree with native distinct
      // semantics: doubles/floats add 0 first so -0.0 folds into 0.0
      // (grouping normalizes signed zero; '-0.0' vs '0.0' strings do
      // not), and binary renders as hex (a raw cast mangles non-UTF8)
      val norm = df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          (col(c) + lit(0)).cast("string")
        case org.apache.spark.sql.types.BinaryType => hex(col(c))
        // cast-to-string is NOT injective for complex types —
        // array("a, b") and array("a", "b") both render "[a, b]" —
        // so render them as JSON, which quotes and escapes elements
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType => to_json(col(c))
        case _ => col(c).cast("string")
      }
      struct(lit(c).as("column"), norm.as("__v"))
    }
    val nDistinct = df
      .select(explode(array(tallStructs: _*)).as("t"))
      .select("t.*")
      .filter(col("__v").isNotNull)
      .distinct()
      .groupBy("column")
      .agg(count(lit(1)).as("n_distinct"))

    basic
      .join(nDistinct, Seq("column"), "left")
      .na.fill(0L, Seq("n_distinct"))
      .select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
  }

  /** Mutual information (nats) between two categorical columns —
    * the column-dependency signal that tells a layout optimizer two
    * columns cluster together (partition by one and the other prunes
    * too) or a schema auditor that a column is derivable. Three
    * partial-aggregated groupBys over the (a, b) contingency counts;
    * the per-cell probability ratio runs in double (cell*N / cx*cy
    * overflows integer range at table scale) but its log is rounded
    * to 9 decimals and decimal-summed, so both engines reduce
    * identically. Returns one row (n, mi).
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__cab"))
    val ca = cells.groupBy(col("__a")).agg(sum(col("__cab")).as("__ca"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__cab")).as("__cb"))
    val tot = cells.agg(sum(col("__cab")).as("__n"))
    cells
      .join(ca, "__a").join(cb, "__b")
      .crossJoin(broadcast(tot))
      .select((col("__cab").cast("decimal(18,0)") *
        round(log(col("__cab").cast("double") * col("__n") /
          (col("__ca").cast("double") * col("__cb"))), 9).cast("decimal(18,9)"))
        .as("__term"), col("__n"))
      .groupBy(col("__n"))
      .agg(round(sum(col("__term")).cast("double") / col("__n"), 6).as("mi"))
      .select(col("__n").as("n"), col("mi"))
  }

  /** DuckDB SQL equivalent of [[mutualInformation]]. */
  def mutualInformationSql(src: String, aCol: String, bCol: String): String =
    s"""WITH cells AS (
       |  SELECT $aCol AS a, $bCol AS b, COUNT(*) AS cab FROM $src
       |  WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL GROUP BY 1, 2),
       |ca AS (SELECT a, SUM(cab) AS ca FROM cells GROUP BY 1),
       |cb AS (SELECT b, SUM(cab) AS cb FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM cells),
       |terms AS (SELECT
       |    CAST(cells.cab AS DECIMAL(18,0)) *
       |      CAST(round(ln(CAST(cells.cab AS DOUBLE) * tot.n /
       |        (CAST(ca.ca AS DOUBLE) * cb.cb)), 9) AS DECIMAL(18,9)) AS term,
       |    tot.n AS n
       |  FROM cells JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot)
       |SELECT n, round(CAST(SUM(term) AS DOUBLE) / n, 6) AS mi
       |FROM terms GROUP BY n""".stripMargin

  /** Functional-dependency discovery over a fixed column list: for
    * every ordered pair (a, b), does a's value DETERMINE b's value?
    * The classic data-profiling primitive behind key detection,
    * denormalization checks, and join-collapse opportunities (if
    * a -> b holds, b can ride a's dimension table instead of being
    * carried through a fact join).
    *
    * a -> b holds iff |distinct a| = |distinct (a, b)|. One scan tags
    * each row with all pairs' values (a bounded explode: rows x
    * pairs), then ONE distinct and one partial-aggregated groupBy —
    * no per-pair rescans. NULL is treated as an ordinary value via a
    * TYPED encoding ("n" for null, "v:" + value otherwise), so a
    * column that is null for two different b values correctly fails
    * the dependency AND a literal string value can never collide with
    * the null marker.
    *
    * Keep `cols` to the handful of columns under investigation: the
    * explode factor is k*(k-1) and the distinct shuffles it.
    */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    def v(c: String) =
      when(col(c).isNull, lit("n")).otherwise(concat(lit("v:"), col(c).cast("string")))
    val tagged = df.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          v(a).as("va"), v(b).as("vb"))
      }: _*)).as("__p"))
      .select(col("__p.col_a"), col("__p.col_b"), col("__p.va"), col("__p.vb"))
    tagged.distinct()
      .groupBy(col("col_a"), col("col_b"))
      .agg(countDistinct(col("va")).as("n_lhs"), count(lit(1)).as("n_pairs"))
      .withColumn("fd_holds", col("n_lhs") === col("n_pairs"))
      .orderBy("col_a", "col_b")
  }

  /** DuckDB SQL twin of [[functionalDependencies]]. */
  def functionalDependenciesSql(src: String, cols: Seq[String]): String = {
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    def v(c: String) =
      s"CASE WHEN $c IS NULL THEN 'n' ELSE 'v:' || CAST($c AS VARCHAR) END"
    val blocks = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  ${v(a)} AS va,
         |  ${v(b)} AS vb FROM $src""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH p AS (
       |$blocks),
       |d AS (SELECT DISTINCT col_a, col_b, va, vb FROM p)
       |SELECT col_a, col_b, COUNT(DISTINCT va) AS n_lhs, COUNT(*) AS n_pairs,
       |       COUNT(DISTINCT va) = COUNT(*) AS fd_holds
       |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Key-skew diagnostics for a prospective join/groupBy key: the
    * one-row report that decides whether the key needs salting (q37's
    * operator) or AQE skew-join handling before a 100 TB run is
    * launched. Reports key cardinality, row count, the heaviest key,
    * discrete p50/p99 of rows-per-key, the top-`topK` keys' row mass,
    * and two ratios: `max_over_avg` (a perfectly uniform key = 1) and
    * `topk_share`.
    *
    * One partial-aggregated groupBy builds the per-key count table;
    * everything after runs on counts, never rows: a single global
    * aggregate (exact discrete percentiles over n_keys values — the
    * same percentile_disc the quantile queries use) plus a
    * TakeOrdered top-K (heap per partition, K rows to the driver)
    * summed and broadcast back. Ties at the top-K boundary carry equal
    * counts, so the reported mass is tie-invariant.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__cnt"))
    val top = counts
      .orderBy(col("__cnt").desc, col(keyCol))
      .limit(topK)
      .agg(sum(col("__cnt")).as("__top_rows"))
    counts
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("__cnt")).as("n_rows"),
        max(col("__cnt")).as("max_rows"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __cnt)")
          .cast("long").as("p50_rows"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY __cnt)")
          .cast("long").as("p99_rows"))
      .crossJoin(broadcast(top))
      .select(
        col("n_keys"), col("n_rows"), col("max_rows"),
        col("p50_rows"), col("p99_rows"),
        col("__top_rows").as("topk_rows"),
        round(col("max_rows") /
          (col("n_rows").cast("double") / col("n_keys")), 6).as("max_over_avg"),
        round(col("__top_rows").cast("double") / col("n_rows"), 6).as("topk_share"))
  }

  /** Exact inner-join output cardinality pre-flight: BEFORE launching a
    * join that might explode, compute what it will produce —
    * `out_rows = Σ_k count_left(k) · count_right(k)` — from the two
    * per-key count tables, never the join itself. The companion to
    * [[skewReport]]: that one looks at one key's distribution, this one
    * at the pair. `amplification` (out rows per left row) ≈ 1 means a
    * well-behaved FK join; `topk_out_share` near 1 means a handful of
    * keys produce the whole output — salt those or pre-aggregate.
    *
    * Cost: exactly one scan + partial-aggregated groupBy per side
    * (counts, not rows); the joined count table is persisted (it feeds
    * both the global aggregate and the TakeOrdered top-K) and handed
    * back as a [[Dedup.CachedDF]] — call `.unpersist()` after the
    * terminal action. Ties at the top-K boundary carry equal
    * contributions, so the reported mass is tie-invariant.
    */
  def joinSizeEstimate(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topK: Int = 10): Dedup.CachedDF = {
    require(topK > 0, "topK must be positive")
    // ONE pass per input builds its per-key count table; their full
    // outer join `m` is the only materialized intermediate (|keys|
    // rows, persisted because both the global aggregate and the top-K
    // read it — Spark's exchange reuse does NOT dedup the two
    // consumers, so without the persist each input would be scanned
    // once per consumer).
    val m = left.groupBy(col(leftKey).as("__k"))
      .agg(count(lit(1)).as("__cl"))
      .join(
        right.groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cr")),
        Seq("__k"), "full_outer")
      .select(col("__k"), col("__cl"), col("__cr"),
        (col("__cl") * col("__cr")).as("__out"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = m.filter(col("__out").isNotNull)
      .orderBy(col("__out").desc, col("__k"))
      .limit(topK)
      .agg(sum(col("__out")).as("__topk_out"))
    val report = m
      .agg(
        coalesce(sum(col("__cl")), lit(0L)).as("n_left_rows"),
        coalesce(sum(col("__cr")), lit(0L)).as("n_right_rows"),
        count(col("__cl")).as("n_left_keys"),
        count(col("__cr")).as("n_right_keys"),
        count(col("__out")).as("n_common_keys"),
        coalesce(sum(col("__out")), lit(0L)).as("out_rows"),
        coalesce(max(col("__out")), lit(0L)).as("max_key_out"))
      .crossJoin(broadcast(top))
      .select(
        col("n_left_rows"), col("n_right_rows"),
        col("n_left_keys"), col("n_right_keys"),
        col("n_common_keys"), col("out_rows"), col("max_key_out"),
        coalesce(col("__topk_out"), lit(0L)).as("topk_out_rows"),
        when(col("out_rows") > 0,
          round(coalesce(col("__topk_out"), lit(0L)).cast("double") /
            col("out_rows"), 6)).as("topk_out_share"),
        when(col("n_left_rows") > 0,
          round(col("out_rows").cast("double") / col("n_left_rows"), 6))
          .as("amplification"))
    Dedup.CachedDF(report, Seq(m))
  }
}
