package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment.
  *
  * Different operations MUST use different salts or their hashes
  * correlate: sampling at 0.5 and then splitting with the same salt
  * would put every sampled row in the first split. The defaults
  * ("s" for sampling, "split" for splits) are therefore distinct.
  *
  * RNG-based sampling (`df.sample`) is irreproducible across engines,
  * partitionings, and reruns. Hashing a stable id and thresholding its
  * md5 prefix gives the same sample everywhere, any number of times —
  * the property a training-data pipeline needs for train/val/test
  * splits that survive pipeline re-runs and backfills.
  *
  * The first 4 hex digits of `md5(salt || ":" || id)` are uniform over
  * 0x0000..0xffff; comparing the PREFIX STRING lexicographically
  * against a hex threshold implements `fraction` without any hex->int
  * conversion, so the identical predicate runs in any SQL engine.
  */
object Sampling {

  /** "g" sorts after every hex string, so fraction 1.0 keeps ALL rows
    * (a clamped 'ffff' with strict < would silently drop ~1/65536).
    */
  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of range")
    val n = math.round(fraction * 65536).toInt
    if (n >= 65536) "g" else f"$n%04x"
  }

  private def prefix(id: Column, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 4)

  /** Keep ~`fraction` of rows, deterministically by `idCol`. */
  def deterministicSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      salt: String = "s"): DataFrame =
    df.filter(prefix(col(idCol), salt) < lit(hexThreshold(fraction)))

  /** The DuckDB/ANSI predicate equivalent to [[deterministicSample]],
    * for oracle SQL construction.
    */
  def samplePredicateSql(idCol: String, fraction: Double, salt: String = "s"): String =
    s"substring(md5('$salt:' || CAST($idCol AS VARCHAR)), 1, 4) < '${hexThreshold(fraction)}'"

  /** Stratified deterministic sample: each stratum keeps its own
    * fraction (e.g. downsample web crawl to 5%, keep curated sources at
    * 100%). Same hash predicate as [[deterministicSample]] — the only
    * per-stratum part is the threshold, so the filter is one codegen'd
    * scan, no shuffle, no per-stratum pass.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "s"): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(""))) { case (acc, (k, f)) =>
        acc.when(col(strataCol) === k, lit(hexThreshold(f)))
      }
      .otherwise(lit(hexThreshold(defaultFraction)))
    df.filter(prefix(col(idCol), salt) < threshold)
  }

  /** The DuckDB/ANSI predicate equivalent to [[stratifiedSample]]. */
  def stratifiedPredicateSql(
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "s"): String = {
    val whens = fractions.toSeq.sortBy(_._1).map { case (k, f) =>
      s"WHEN $strataCol = '$k' THEN '${hexThreshold(f)}'"
    }.mkString(" ")
    s"substring(md5('$salt:' || CAST($idCol AS VARCHAR)), 1, 4) < " +
      s"(CASE $whens ELSE '${hexThreshold(defaultFraction)}' END)"
  }

  /** The ANSI CASE expression equivalent to [[assignSplit]], for oracle
    * SQL construction.
    */
  def splitCaseSql(
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): String = {
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val p = s"substring(md5('$salt:' || CAST($idCol AS VARCHAR)), 1, 4)"
    val whens = splits.init.zip(cum.init).map { case ((name, _), bound) =>
      s"WHEN $p < '${hexThreshold(bound)}' THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }

  /** First 8 hex digits of md5-hex column `hashCol` as an exact 32-bit
    * integer, via the locate/strpos digit trick — pure integer
    * arithmetic that any engine reproduces bit-for-bit (`conv()` does
    * not exist everywhere). Shared by priority sampling, MinHash, and
    * the partition-fingerprint queries.
    */
  def hexPrefixValue(hashCol: String): Column = hexPrefixValue(col(hashCol))

  /** Column-expression form of [[hexPrefixValue]] — same locate/substr
    * tree (via `call_function`, no SQL-string parsing), so it is also
    * registrable as a session SQL function.
    */
  def hexPrefixValue(hashCol: Column): Column =
    (0 until 8).map { i =>
      (call_function("locate", substring(hashCol, i + 1, 1),
        lit("0123456789abcdef")).cast("long") - 1) * (1L << (4 * (7 - i)))
    }.reduce(_ + _)

  /** ANSI-SQL twin of [[hexPrefixValue]] over hex column `hashCol`. */
  def hexPrefixSql(hashCol: String): String = hexValueSql(hashCol, 8)

  /** [[hexPrefixSql]] generalized to the first `chars` hex digits
    * (`chars <= 15` keeps the value inside a signed 64-bit int) — the
    * oracle twin of a `conv(substring(md5(x), 1, chars), 16, 10)`
    * term identity on the Spark side.
    */
  def hexValueSql(hashCol: String, chars: Int): String = {
    require(chars >= 1 && chars <= 15, "1..15 hex chars fit a signed long")
    (0 until chars).map(i =>
      s"(strpos('0123456789abcdef', substr($hashCol, ${i + 1}, 1)) - 1) * ${1L << (4 * (chars - 1 - i))}"
    ).mkString(" + ")
  }

  /** Weight-proportional top-k via priority sampling (Duffield, Lund &
    * Thorup): each row gets priority `w / u` for a deterministic
    * per-row uniform `u`, and the k highest priorities are the sample —
    * heavy rows are proportionally more likely in, yet any row CAN
    * appear (the estimator stays unbiased under the DLT weighting).
    *
    * Built for cross-engine determinism with NO transcendental math:
    * `u = (x + 1) / 2^32` where x is the first 8 hex digits of
    * `md5(salt:id)` (exact integer arithmetic via [[hexPrefixValue]]),
    * so `u` is exact in IEEE754 and `w / u` is a single
    * correctly-rounded division — identical in every engine, unlike
    * the `-ln(u)/w` exponential-key formulation whose libm calls
    * differ. The top-k itself plans as TakeOrderedAndProject — no
    * global sort.
    */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "ps"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__h",
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))
      .withColumn("__u",
        (hexPrefixValue("__h") + 1).cast("double") / 4294967296.0)
      .withColumn("priority", col(weightCol).cast("double") / col("__u"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .drop("__h", "__u")
  }

  /** Per-group token-budget selection: walk each group's rows in
    * deterministic `md5(salt:id)` order and keep the prefix whose
    * running token total stays within `budget` — "give me ~N tokens
    * per source, chosen reproducibly" (the curation step that turns
    * per-source mixing weights into an actual training corpus). The
    * hash order makes the kept set independent of ingestion order and
    * stable across reruns/backfills, like every sampler here.
    *
    * Because token counts are positive, the running sum is monotone
    * per group, so `cum <= budget` IS a prefix — the first document
    * that overflows the budget cuts the group off. One hash shuffle by
    * group plus the window's in-partition sort (which spills, so a
    * giant group degrades to disk rather than OOM); no driver state,
    * no second pass.
    */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenCol: String,
      budget: Long,
      salt: String = "tb"): DataFrame = {
    require(budget > 0, "budget must be positive")
    // (__h, idCol) ordering + an explicit ROWS frame: with the default
    // RANGE frame, duplicate ids would be frame peers and the running
    // sum would include the whole tie group at once (overshooting the
    // budget or dropping the entire cluster). ROWS over a total order
    // makes the prefix well-defined even for duplicate ids.
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__h", "__cum")
  }

  /** DuckDB/ANSI window SQL skeleton matching [[tokenBudgetSample]]'s
    * running sum: same (md5, id) total order, same explicit ROWS frame.
    */
  def tokenBudgetCumSql(idCol: String, groupCol: String, tokenCol: String,
      salt: String = "tb"): String =
    s"SUM($tokenCol) OVER (PARTITION BY $groupCol " +
      s"ORDER BY md5('$salt:' || CAST($idCol AS VARCHAR)), $idCol " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"

  /** Normalized (key-sorted) target weights shared by
    * [[domainMixSample]] and its oracle-SQL twin: normalizing ONCE in
    * Scala and embedding the resulting shortest-round-trip double
    * literals on both sides keeps the Spark and DuckDB arithmetic
    * bit-identical (each engine parses the same decimal literal to the
    * same IEEE754 double, instead of each re-deriving w/sum(w) its own
    * way).
    */
  def normalizedTargets(targets: Map[String, Double]): Seq[(String, Double)] = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(_ > 0), "target weights must be positive")
    val total = targets.values.sum
    targets.toSeq.sortBy(_._1).map { case (k, w) => k -> w / total }
  }

  /** Domain-mix resampling: downsample each group so the kept corpus
    * approaches the `targets` mixing proportions — the step that turns
    * per-source mixing weights (hand-set or DoReMi-style learned) into
    * an actual training corpus. No group is upsampled: the binding
    * group (smallest n_g / t_g) keeps everything and every other group
    * downsamples toward its share, i.e. the output is the LARGEST
    * target-proportioned corpus obtainable by pure filtering.
    *
    * Selection is the deterministic md5-threshold of every sampler
    * here, but with a PER-GROUP fraction computed relationally:
    * group counts (one tiny partial-aggregated shuffle) -> scalar
    * C = min(n_g / t_g) (1-row broadcast cross join, the house scalar
    * pattern) -> frac_g = min(1, C * t_g / n_g) joined back by group
    * (broadcast — the group table is #domains rows). The row filter
    * itself is a codegen'd scan: no shuffle of the data being sampled,
    * no window, no per-group pass — the property that matters when the
    * corpus is 100 TB and the group table is a few thousand rows.
    *
    * Groups absent from `targets` get weight 0 and are dropped.
    */
  def domainMixSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      targets: Map[String, Double],
      salt: String = "mix"): DataFrame = {
    val norm = normalizedTargets(targets)
    val twExpr = norm
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (k, w)) =>
        acc.when(col(groupCol) === k, lit(w))
      }
      .otherwise(lit(0.0))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__tw", twExpr)
      .filter(col("__tw") > 0)
    val cmin = counts.agg(min(col("__n").cast("double") / col("__tw")).as("__cmin"))
    val fr = counts.crossJoin(broadcast(cmin))
      .withColumn("__frac",
        least(lit(1.0), col("__cmin") * col("__tw") / col("__n").cast("double")))
      .select(col(groupCol), col("__frac"))
    df.join(broadcast(fr), groupCol)
      .withColumn("__h", md5(concat(lit(s"$salt:"), col(idCol).cast("string"))))
      .filter(hexPrefixValue("__h").cast("double") < col("__frac") * 4294967296.0)
      .select(df.columns.map(col): _*) // USING-join put the key first; restore caller order
  }

  /** Assign each row to a named split with the given weights (summing
    * to <= 1; remainder falls into the last split). Deterministic by
    * `idCol`.
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val p = prefix(col(idCol), salt)
    val expr = splits.init.zip(cum.init).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), bound)) =>
        acc.when(p < lit(hexThreshold(bound)), lit(name))
    }.otherwise(lit(splits.last._1))
    df.withColumn("split", expr)
  }

  /** Leakage-safe train/validation/test split: near-duplicate
    * documents must land on the SAME side of a split, or the held-out
    * set silently contains paraphrases of training rows and the eval
    * is contaminated by construction. [[assignSplit]] hashes the
    * per-row id; this hashes the near-dup CLUSTER id (from
    * [[Dedup.dupClusters]]), so every member of a cluster — and every
    * singleton, whose cluster is itself — draws the same split.
    *
    * One id-keyed join of the cluster map onto the corpus; the split
    * assignment itself stays a pure codegen'd projection. Cluster
    * proportions follow the weights in expectation over CLUSTERS, not
    * rows — a giant cluster moves as one unit (that is the point).
    */
  def leakageSafeSplit(
      docs: DataFrame,
      clusters: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    val assigned = assignSplit(
      clusters.select(col(idCol), col("cluster_id")), "cluster_id", splits, salt)
    docs.join(assigned.select(col(idCol), col("split")), idCol)
  }

  /** Temperature-based domain mixture (the mC4/XLM-R mixing step at
    * τ = 1/2): per-domain sampling weights proportional to
    * `sqrt(n_tokens)`, flattening the natural distribution so
    * low-resource domains are not drowned by head domains, plus the
    * integer token allocation of a `budgetTokens` epoch.
    *
    * Engineered INTEGER-EXACT so any engine reproduces every cell:
    * `s_d = floor(sqrt(n_tokens_d))` is exact for counts below 2^52
    * (the double sqrt is correctly rounded and the floor kills the
    * ulp), the normalizer `Σ s_d` is a BIGINT sum, the weight is a
    * single IEEE division rounded to 6 decimals, and the allocation
    * `budget * s_d div Σ s_d` stays in exact integer arithmetic — no
    * order-dependent floating-point accumulation anywhere (a
    * `pow(n, τ)`-based general form would make the normalizer a sum
    * of irrationals whose value depends on reduction order).
    *
    * Output `(groupCol, n_docs, n_tokens, weight, alloc_tokens)`; one
    * partial-agged groupBy + a broadcast single-row total.
    *
    * Degenerate corpus (every domain has 0 tokens ⇒ normalizer 0)
    * yields weight 0 / alloc 0 rather than NaN/NULL. The allocation
    * product runs in DECIMAL(38,0): `budget ≤ 2^63 < 10^19` times
    * `s_d = floor(sqrt(Σtokens)) < 2^32 < 10^10` is under 10^29 —
    * exact at 38 digits, so no Long overflow is reachable for ANY
    * budget/corpus, and the integral divide lands back in BIGINT
    * (the quotient is ≤ budget because `s_d ≤ Σ s_d`).
    */
  def temperatureMixture(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    val perDomain = docs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
      .withColumn("__s", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val total = perDomain.agg(sum(col("__s")).as("__st"))
    perDomain.crossJoin(broadcast(total))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        when(col("__st") === 0L, lit(0.0d))
          .otherwise(round(col("__s").cast("double") / col("__st"), 6))
          .as("weight"),
        when(col("__st") === 0L, lit(0L))
          .otherwise(
            expr(s"(cast(${budgetTokens} as decimal(38,0)) * __s) div __st"))
          .as("alloc_tokens"))
      .orderBy(groupCol)
  }
}
