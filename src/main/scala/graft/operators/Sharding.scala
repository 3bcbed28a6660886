package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic shard assignment and the export manifest — the
  * bookkeeping step of a sharded training-data dump (the reference's
  * single-table world has no export sharding; this is extension
  * surface for the 100 TB pipeline).
  *
  * Assignment is `hash(salt:id) mod nShards` where the hash is the
  * exact 32-bit md5-hex prefix ([[Sampling.hexPrefixValue]]), so any
  * engine reproduces the placement bit-for-bit: a shard written today
  * can be re-derived (and audited) by DuckDB, a second Spark cluster,
  * or a reader with md5 and integer arithmetic. That stability is the
  * point — incremental re-exports must route an unchanged doc to the
  * unchanged shard, or every delta ships the whole corpus.
  *
  * Scale shape: the manifest is one scan with map-side partial
  * aggregation into `nShards` groups, then a window over the
  * nShards-row aggregate for the share/balance columns — the base
  * table is scanned ONCE and never sorted; only the tiny aggregate
  * crosses a single-partition exchange. The physical export is
  * `df.repartition(shard).write.partitionBy("shard")` ([[writeSharded]]),
  * which co-locates each shard's rows into its own task.
  */
object Sharding {

  /** md5-hex of `salt:id` — the hash column both engines agree on. */
  private def saltedHash(idCol: String, salt: String): Column =
    md5(concat_ws(":", lit(salt), col(idCol).cast("string")))

  /** Shard id in [0, nShards) for each row; deterministic in
    * (salt, id), uniform over shards (md5 prefix is uniform on
    * [0, 2^32)). Non-negative dividend, so `%` == `pmod`.
    */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("__h", saltedHash(idCol, salt))
      .withColumn("shard", Sampling.hexPrefixValue("__h") % nShards)
      .drop("__h")
  }

  /** Per-shard manifest: row/token/byte totals plus share-of-corpus
    * and a balance factor (observed docs / ideal docs-per-shard; 1.0
    * is perfectly even). The manifest is what a downstream trainer
    * reads to plan epoch mixing — and what an operator eyeballs to
    * catch a salt collision or a skewed id space before 100 TB ships.
    */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    val perShard = shardAssign(df, idCol, nShards, salt)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"),
        sum(octet_length(col(textCol)).cast("long")).as("n_bytes"))
    // totals via a window over the nShards-row aggregate: bounded by
    // construction, avoids a second scan of the base table
    val w = Window.partitionBy()
    perShard
      .withColumn("docs_share",
        round(col("n_docs").cast("double") / sum("n_docs").over(w), 6))
      .withColumn("tokens_share",
        round(col("n_tokens").cast("double") / sum("n_tokens").over(w), 6))
      .withColumn("balance",
        round(col("n_docs").cast("double") * nShards / sum("n_docs").over(w), 6))
      .orderBy("shard")
  }

  /** ANSI-SQL twin of [[shardManifest]] (DuckDB-runnable). */
  def shardManifestSql(
      table: String,
      idCol: String,
      textCol: String,
      nShards: Int,
      salt: String = "shard"): String = {
    val tk = s"len(${TextAnalysis.tokensSql(textCol)})"
    s"""WITH h AS (SELECT md5('$salt:' || CAST($idCol AS VARCHAR)) AS hh,
       |    $tk AS tk, strlen($textCol) AS b FROM $table),
       |s AS (SELECT (${Sampling.hexPrefixSql("hh")}) % $nShards AS shard,
       |    tk, b FROM h),
       |a AS (SELECT shard, COUNT(*) AS n_docs,
       |    CAST(SUM(tk) AS BIGINT) AS n_tokens,
       |    CAST(SUM(b) AS BIGINT) AS n_bytes FROM s GROUP BY 1)
       |SELECT shard, n_docs, n_tokens, n_bytes,
       |  round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS docs_share,
       |  round(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6) AS tokens_share,
       |  round(CAST(n_docs AS DOUBLE) * $nShards / SUM(n_docs) OVER (), 6) AS balance
       |FROM a ORDER BY shard""".stripMargin
  }

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar, IEEE ToN 1998): every document goes to the shard
    * maximizing `hexPrefix(md5(salt:shard:id))`, ties to the lower
    * shard id. Mod-N placement ([[shardAssign]]) reshuffles almost the
    * whole corpus when the shard count changes; HRW moves EXACTLY the
    * docs whose new global winner is an added shard — expected
    * `(M−N)/M` of the corpus on a grow from N to M, and every moved
    * doc lands on a NEW shard (nothing migrates between surviving
    * shards). At 100 TB that is the difference between shipping 1/3 of
    * the corpus and shipping all of it when the fleet grows.
    *
    * Cost: `nShards` md5s per row (the standard HRW trade — per-row,
    * no shuffle; the argmax folds in one `array_max` over
    * `(score, −shard)` structs). For hundreds of shards, move to a
    * two-level scheme (HRW over shard GROUPS, mod within); the salt
    * keeps placements reproducible by any engine either way.
    */
  def rendezvousAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "hrw",
      outCol: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val entries = (0 until nShards).map { s =>
      struct(
        Sampling.hexPrefixValue(md5(concat_ws(":",
          lit(salt), lit(s.toString), col(idCol).cast("string")))).as("sc"),
        lit(-s).as("ns"))
    }
    df.withColumn(outCol,
      (array_max(array(entries: _*)).getField("ns") * -1).cast("long"))
  }

  /** Movement matrix for an HRW resize from `fromShards` to
    * `toShards`: one row per observed `(old_shard, new_shard)` with
    * doc count and a moved flag. The minimal-movement law makes this
    * auditable at a glance: every `moved` row's `new_shard` must be
    * one of the added shards (grow) — anything else means the salt or
    * the hash drifted between runs.
    */
  def rebalanceReport(
      df: DataFrame,
      idCol: String,
      fromShards: Int,
      toShards: Int,
      salt: String = "hrw"): DataFrame =
    rendezvousAssign(
        rendezvousAssign(df, idCol, fromShards, salt, "old_shard"),
        idCol, toShards, salt, "new_shard")
      .groupBy(col("old_shard"), col("new_shard"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("moved", col("old_shard") =!= col("new_shard"))
      .orderBy("old_shard", "new_shard")

  /** ANSI-SQL twin of [[rebalanceReport]] (DuckDB-runnable). */
  def rebalanceReportSql(
      table: String,
      idCol: String,
      fromShards: Int,
      toShards: Int,
      salt: String = "hrw"): String = {
    val sc = Sampling.hexPrefixSql("hh")
    s"""WITH sl AS (SELECT unnest(range($toShards)) AS s),
       |hx AS (SELECT t.$idCol AS did, sl.s,
       |         md5('$salt:' || CAST(sl.s AS VARCHAR) || ':' || CAST(t.$idCol AS VARCHAR)) AS hh
       |       FROM $table t CROSS JOIN sl),
       |sv AS (SELECT did, s, ($sc) AS sc FROM hx),
       |os AS (SELECT did, CAST(s AS BIGINT) AS old_shard FROM (
       |  SELECT did, s, ROW_NUMBER() OVER (PARTITION BY did ORDER BY sc DESC, s) AS rn
       |  FROM sv WHERE s < $fromShards) t WHERE rn = 1),
       |ns AS (SELECT did, CAST(s AS BIGINT) AS new_shard FROM (
       |  SELECT did, s, ROW_NUMBER() OVER (PARTITION BY did ORDER BY sc DESC, s) AS rn
       |  FROM sv) t WHERE rn = 1)
       |SELECT old_shard, new_shard, COUNT(*) AS n_docs,
       |  old_shard <> new_shard AS moved
       |FROM os JOIN ns USING (did)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Physical export: one directory per shard
    * (`.../shard=<k>/part-*.parquet`), each shard's rows co-located
    * into its own write task by the shard-keyed repartition. Returns
    * the manifest-ready assigned frame for chaining.
    */
  def writeSharded(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      outDir: String,
      salt: String = "shard"): DataFrame = {
    val assigned = shardAssign(df, idCol, nShards, salt)
    assigned
      .repartition(nShards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)
    assigned
  }
}
