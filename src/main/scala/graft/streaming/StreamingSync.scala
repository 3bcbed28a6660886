package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.config.{SyncConfig, TableSyncConfig}
import graft.core.{Differ, PrimaryKeyValidator}
import graft.sinks.JdbcSyncWriter

/** Incremental sync: a Structured Streaming source feeding one
  * diff-sync per micro-batch (the reference names this as future work —
  * SURVEY §2.10; `foreachBatch` is its natural Spark shape).
  *
  * Each batch is diffed against the CURRENT table state and applied as
  * upserts in one transaction per batch (insert + update; deletes are
  * meaningless against a partial batch, so `deleteNotInFile` is
  * rejected). Exactly-once at the table level comes from the source
  * checkpoint (a replayed batch re-diffs against the already-updated
  * table and finds nothing to change — the diff makes the write
  * idempotent).
  */
object StreamingSync {

  /** Apply one micro-batch as a transactional diff-sync. Returns
    * (inserted, updated).
    */
  def applyBatchDiff(
      batch: DataFrame,
      config: SyncConfig,
      t: TableSyncConfig): (Int, Int) = {
    val spark = batch.sparkSession
    val conn = JdbcSyncWriter.connect(config.db)
    try {
      val dbCols = JdbcSyncWriter.tableColumns(conn, t.name)
      val db0 = JdbcSyncWriter.readTable(spark, config.db, t.name)
      val db = db0.toDF(db0.columns.map(_.toLowerCase): _*)
      val fileCols = batch.columns.map(_.toLowerCase).toSeq
      val cols = fileCols.filter(dbCols.contains)
      val pk = t.primaryKey.toLowerCase
      require(cols.contains(pk), s"primary key '$pk' missing from batch columns")

      val dbSel = db.select(cols.map(col): _*)
      val aligned = cols.foldLeft(
        batch.toDF(batch.columns.map(_.toLowerCase): _*).select(cols.map(col): _*)) {
        (d, c) =>
          val target = dbSel.schema(c).dataType
          if (d.schema(c).dataType == target) d
          else d.withColumn(c, col(c).cast(target))
      }
      PrimaryKeyValidator.validateStrict(aligned, pk)

      val diff = Differ.diff(aligned, dbSel, pk)
      val ins = diff.toInsert.select(cols.map(col): _*).collect().toSeq
      val upd = diff.toUpdate.select(cols.map(col): _*).collect().toSeq
      val i = JdbcSyncWriter.bulkInsert(conn, t.name, cols, ins, t.timestampColumns)
      val u = JdbcSyncWriter.bulkUpdate(conn, t.name, cols, pk, upd,
        t.timestampColumns, t.immutableColumns)
      conn.commit()
      (i, u)
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }

  /** Start an incremental sync from a file directory: every new CSV
    * file dropped into `sourceDir` becomes a micro-batch upsert. The
    * checkpoint makes file processing exactly-once across restarts.
    */
  def start(
      spark: SparkSession,
      config: SyncConfig,
      sourceDir: String,
      schema: StructType,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(config.tables.size == 1, "incremental sync is per-table")
    val t = config.tables.head
    require(!t.deleteNotInFile,
      "deleteNotInFile is not meaningful for incremental batches")
    val src = spark.readStream
      .schema(schema)
      .option("header", "true")
      .csv(sourceDir)
    src.writeStream
      .queryName(s"graft-sync-${t.name}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (i, u) = applyBatchDiff(batch, config, t)
        println(s"[stream-sync] ${t.name} batch $batchId: $i inserted, $u updated")
      }
      .start()
  }
}
