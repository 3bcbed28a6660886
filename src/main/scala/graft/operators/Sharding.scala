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
