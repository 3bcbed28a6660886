package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Output-file hygiene: a 100 TB pipeline that writes one file per
  * shuffle partition produces millions of small files, which punishes
  * every downstream scan (footer reads, task scheduling) and the
  * object store's listing. Compaction targets a row count per output
  * file instead.
  */
object Compaction {

  /** Write `df` with roughly `targetRowsPerFile` rows per output file.
    *
    * `df` is persisted for the duration of the call so the sizing
    * `count()` and the write share one upstream computation. Unpartitioned
    * layouts round-robin into `ceil(rows/target)` files, so files come out
    * evenly sized regardless of upstream skew.
    *
    * For partitioned layouts each partition value is spread over
    * `ceil(rowsForValue/target)` writer buckets (deterministic hash of the
    * non-partition columns), so a hot value gets many parallel writers and
    * many right-sized files instead of one giant file, while tiny values
    * still collapse to a single file. `maxRecordsPerFile` backstops any
    * residual skew from hash collisions in the bucket assignment.
    */
  def writeCompacted(
      df: DataFrame,
      path: String,
      targetRowsPerFile: Long,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    // backstop against residual skew (hash-collision bucket merges, uneven
    // round-robin), with headroom so a file a few rows over target is NOT
    // split into a full-size file plus a sliver
    val maxRecords = 2 * targetRowsPerFile
    // persist only if the caller hasn't: persist-on-cached is a no-op but
    // unpersist would evict the CALLER's cache entry
    val ownCache = df.storageLevel == StorageLevel.NONE
    if (ownCache) df.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = df.count()
      val nFiles =
        math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      if (partitionBy.isEmpty) {
        df.repartition(nFiles)
          .write.mode(mode)
          .option("maxRecordsPerFile", maxRecords)
          .parquet(path)
      } else {
        val pCols = partitionBy.map(col)
        // null-safe (<=>) join: a plain equi-join would silently DROP
        // rows whose partition value is NULL (they belong in
        // __HIVE_DEFAULT_PARTITION__, not nowhere)
        val counts = df.groupBy(pCols: _*).agg(count(lit(1)).as("__rows"))
          .select(partitionBy.map(c => col(c).as(s"__cnt_$c")) :+ col("__rows"): _*)
        val joinCond = partitionBy
          .map(c => col(c) <=> col(s"__cnt_$c"))
          .reduce(_ && _)
        val dataCols = df.columns.filterNot(partitionBy.contains)
        // Deterministic per-row hash; constant when every column is a
        // partition column (then maxRecordsPerFile alone splits files).
        val rowHash =
          if (dataCols.isEmpty) lit(0L) else xxhash64(dataCols.map(col): _*)
        val bucketsForValue =
          greatest(lit(1L), ceil(col("__rows").cast("double") / targetRowsPerFile).cast("long"))
        df.join(broadcast(counts), joinCond)
          .withColumn("__bucket", pmod(rowHash, bucketsForValue))
          .repartition(nFiles, (pCols :+ col("__bucket")): _*)
          .drop(partitionBy.map(c => s"__cnt_$c") :+ "__rows" :+ "__bucket": _*)
          .write.mode(mode)
          .option("maxRecordsPerFile", maxRecords)
          .partitionBy(partitionBy: _*)
          .parquet(path)
      }
      rows
    } finally {
      if (ownCache) df.unpersist()
    }
  }
}
