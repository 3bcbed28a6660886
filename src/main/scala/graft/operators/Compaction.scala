package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output-file hygiene: a 100 TB pipeline that writes one file per
  * shuffle partition produces millions of small files, which punishes
  * every downstream scan (footer reads, task scheduling) and the
  * object store's listing. Compaction targets a row count per output
  * file instead.
  */
object Compaction {

  /** Write `df` with roughly `targetRowsPerFile` rows per output file.
    *
    * The file count comes from a cheap `count()` (one pass, but
    * column-pruned to nothing by parquet statistics); the repartition
    * is round-robin, so files come out evenly sized regardless of the
    * upstream partitioning skew. For partitioned layouts pass
    * `partitionBy` — rows are then hashed by the partition columns
    * first so each directory gets contiguous writers instead of every
    * task appending to every directory.
    */
  def writeCompacted(
      df: DataFrame,
      path: String,
      targetRowsPerFile: Long,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val arranged =
      if (partitionBy.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles, partitionBy.map(col): _*)
    val writer = arranged.write.mode(mode)
    (if (partitionBy.isEmpty) writer else writer.partitionBy(partitionBy: _*))
      .parquet(path)
    rows
  }
}
