package graft.core

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

import graft.config.{DependencyGraph, SyncConfig, TableSyncConfig}
import graft.sinks.JdbcSyncWriter
import graft.sources.Readers

/** Per-table sync outcome. */
final case class SyncResult(
    table: String,
    mode: String,
    inserts: Int,
    updates: Int,
    deletes: Int,
    plan: Option[ExecutionPlan] = None)

/** Materialized operations for one table, computed against the
  * original DB state before any write starts.
  */
private final case class TableOps(
    cfg: TableSyncConfig,
    cols: Seq[String],
    pk: String,
    insRows: Seq[Row],
    updRows: Seq[Row],
    delRows: Seq[Row],
    overwriteRows: Seq[Row],
    dbCount: Long,
    // set when the overwrite file exceeded the distributed threshold:
    // the rows stay in this (un-collected) frame and reinsert through
    // the parallel JDBC writer after the main transaction commits
    overwriteDf: Option[DataFrame] = None,
    overwriteCount: Long = 0L)

/** Orchestration of file -> JDBC synchronization (reference
  * `RunApp`/`syncData`/`syncMultipleTablesData`, `main.go:59-134`,
  * `dbsync.go:407-491`, `dbsync.go:931-1291`).
  *
  * The heavy relational work (scans, schema intersection, validation,
  * three-way diff) runs distributed through Spark; the transaction
  * boundary stays on the driver (one JDBC connection, one commit) to
  * preserve the reference's all-or-nothing guarantee.
  *
  * Read/write phasing: every table's diff is computed and MATERIALIZED
  * against the original DB state before the first write. That is safe
  * because the three diff sets are disjoint by construction (toInsert =
  * file∖db, toUpdate ⊆ file∩db, toDelete = db∖file), and necessary
  * because Spark's JDBC scans run on their own connections — a scan
  * issued after the driver transaction started writing would deadlock
  * on its row locks. (The reference re-reads between phases only
  * because its reads share the single transaction's connection —
  * `dbsync.go:1185`, `dbsync.go:1260`.)
  *
  * Lifecycle per table:
  *   1. read file (CSV/JSON by extension; RFC3339 promotion)
  *   2. read current DB table; resolve the actual sync column set as
  *      file-columns ∩ db-columns ∩ configured columns; the PK must
  *      survive (`determineActualSyncColumns`, `dbsync.go:321-344`)
  *   3. diff mode: strict PK validation (aborts on violations)
  *   4. dry-run: build the ExecutionPlan, write nothing
  *   5. else: deletes child->parent, then inserts/updates
  *      parent->child, one commit
  */
/** The sync exceeded its configured wall-clock budget (reference
  * `main.go:59-62`: the whole run is bounded by a 5-minute context).
  * The transaction is rolled back before this is thrown.
  */
final class SyncTimeoutException(msg: String) extends RuntimeException(msg)

object SyncRunner {

  /** All configured file paths must exist before any work starts
    * (reference `ValidateFilePaths`, `loader.go:232-288`) — failing
    * fast beats discovering a typo mid-transaction.
    */
  private def validateFilePaths(config: SyncConfig): Unit = {
    val missing = config.tables
      .map(_.filePath)
      .filter(p => p.nonEmpty && !new java.io.File(p).exists())
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"sync file(s) not found: ${missing.mkString(", ")}")
  }

  /** Runs the sync under the configured wall-clock deadline (reference
    * `main.go:59-62`; `timeoutSeconds <= 0` disables it). The work runs
    * on a daemon worker thread; on deadline the worker is interrupted —
    * JDBC drivers (Derby included) abort the in-flight statement and
    * kill the connection on interrupt, and Spark actions throw out of
    * their result wait — so the worker's normal rollback path runs (a
    * dead connection has already rolled back server-side).
    */
  def run(spark: SparkSession, config: SyncConfig): Seq[SyncResult] = {
    val budget = config.timeoutSeconds
    if (budget <= 0) return runInternal(spark, config)
    @volatile var outcome: Either[Throwable, Seq[SyncResult]] = null
    val worker = new Thread(() => {
      outcome =
        try Right(runInternal(spark, config))
        catch { case t: Throwable => Left(t) }
    }, "graft-sync-worker")
    worker.setDaemon(true)
    worker.start()
    worker.join(budget * 1000L)
    if (outcome == null) {
      worker.interrupt()
      worker.join(15000L) // give the abort path time to roll back
      // Re-read the outcome ONCE after the grace join (a second read
      // could observe a commit that landed between match and message —
      // the exact committed-but-reported-rolled-back hazard): the
      // interrupt may have landed past conn.commit(), in which case
      // the worker finished successfully during the grace window and
      // reporting "rolled back" would invite a duplicate re-run.
      val o = outcome
      o match {
        case Right(results) => return results
        case _ =>
          throw new SyncTimeoutException(
            s"sync exceeded its ${budget}s wall-clock budget; " +
              (if (o == null) "worker still running, transaction will roll back on abort"
               else "transaction rolled back"))
      }
    }
    outcome.fold(e => throw e, identity)
  }

  private def runInternal(spark: SparkSession, config: SyncConfig): Seq[SyncResult] = {
    config.validated()
    validateFilePaths(config)
    val conn = JdbcSyncWriter.connect(config.db)
    try {
      val graph = new DependencyGraph(
        config.tables.map(t => t.name -> t.dependencies).toMap)
      val (insertOrder, deleteOrder) = graph.syncOrders
      val byName = config.tables.map(t => t.name -> t).toMap

      // Compute + materialize all ops before any write (see scaladoc).
      // Files load before the DB work, mirroring the reference's
      // outside-the-tx file loading (`dbsync.go:936-944`).
      val ops = insertOrder.map(n =>
        n -> computeOps(spark, config, conn, byName(n))).toMap

      val results =
        if (config.dryRun) {
          insertOrder.map(n => planOnly(ops(n)))
        } else {
          // Phase 1: ALL deletes child -> parent — diff-mode
          // deleteNotInFile deletes and overwrite-mode full clears.
          // (The reference clears overwrite tables in its insert phase,
          // dbsync.go:1231-1250, which violates FK constraints when an
          // overwritten parent still has child rows; clearing in the
          // delete phase preserves its intent safely.)
          val deleted = deleteOrder.flatMap { n =>
            val o = ops(n)
            o.cfg.mode match {
              case SyncConfig.ModeOverwrite =>
                JdbcSyncWriter.deleteAll(conn, n)
                None
              case _ if o.cfg.deleteNotInFile && o.delRows.nonEmpty =>
                val keys = o.delRows.map(_.getAs[Any](o.pk))
                Some(n -> JdbcSyncWriter.bulkDelete(conn, n, o.pk, keys))
              case _ => None
            }
          }.toMap
          // Phase 2: inserts/updates, parent -> child. Distributed
          // overwrites (file above the threshold) are DEFERRED: their
          // deleteAll committed with the main transaction, but the
          // reinsert runs through Spark's parallel JDBC writer after
          // the commit — executors open their own connections, which
          // would otherwise deadlock on (or not see) the driver
          // transaction's uncommitted delete.
          insertOrder.map { n =>
            val o = ops(n)
            o.cfg.mode match {
              case SyncConfig.ModeOverwrite if o.overwriteDf.isDefined =>
                SyncResult(n, o.cfg.mode, 0, 0, 0)
              case SyncConfig.ModeOverwrite =>
                val ins = JdbcSyncWriter.bulkInsert(
                  conn, n, o.cols, o.overwriteRows, o.cfg.timestampColumns)
                SyncResult(n, o.cfg.mode, ins, 0, 0)
              case _ =>
                val i = JdbcSyncWriter.bulkInsert(
                  conn, n, o.cols, o.insRows, o.cfg.timestampColumns)
                val u = JdbcSyncWriter.bulkUpdate(
                  conn, n, o.cols, o.pk, o.updRows,
                  o.cfg.timestampColumns, o.cfg.immutableColumns)
                SyncResult(n, o.cfg.mode, i, u, deleted.getOrElse(n, 0))
            }
          }
        }
      if (config.dryRun) conn.rollback() else conn.commit()
      // Post-commit distributed appends, parent -> child. Timestamp
      // columns not in the sync set are injected as now(), mirroring
      // bulkInsert. Per-partition commits: a failure here leaves the
      // overwrite table partially loaded (documented relaxation) —
      // re-running the sync restores it (deleteAll + reinsert).
      if (config.dryRun) {
        ops.values.foreach(_.overwriteDf.foreach(_.unpersist(false)))
        results
      } else {
        val counts = insertOrder.flatMap { n =>
          ops(n).overwriteDf.map { df =>
            val o = ops(n)
            val extraTs = o.cfg.timestampColumns.filterNot(o.cols.contains)
            val withTs = extraTs.foldLeft(df)((d, c) =>
              d.withColumn(c, org.apache.spark.sql.functions.current_timestamp()))
            JdbcSyncWriter.appendDistributed(withTs, config.db, n)
            df.unpersist(false) // snapshot pinned since the scale probe
            n -> o.overwriteCount
          }
        }.toMap
        if (counts.isEmpty) results
        else results.map(r =>
          counts.get(r.table).fold(r)(c =>
            // SyncResult carries Int counts (reference parity);
            // saturate rather than wrap for a >2^31-row overwrite
            r.copy(inserts = math.min(c, Int.MaxValue.toLong).toInt)))
      }
    } catch {
      case e: Throwable =>
        // an interrupt-aborted connection is already dead (and rolled
        // back server-side) — the explicit rollback then throws too
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally {
      try conn.close() catch { case _: Throwable => () }
    }
  }

  private def computeOps(
      spark: SparkSession,
      config: SyncConfig,
      conn: Connection,
      t: TableSyncConfig): TableOps = {

    val file = Readers.forPath(spark, t.filePath, t.columns)
    val dbCols = JdbcSyncWriter.tableColumns(conn, t.name)
    val db0 = JdbcSyncWriter.readTable(spark, config.db, t.name)
    val db = db0.toDF(db0.columns.map(_.toLowerCase): _*)

    // three-way intersection, file-header order (dbsync.go:321-344);
    // empty file falls back to the DB column list (dbsync.go:447-459)
    val fileCols = file.columns.map(_.toLowerCase).toSeq
    val base = if (fileCols.isEmpty) dbCols else fileCols.filter(dbCols.contains)
    val cols =
      if (t.columns.nonEmpty) base.filter(c => t.columns.map(_.toLowerCase).contains(c))
      else base
    val pk = t.primaryKey.toLowerCase
    if (t.mode == SyncConfig.ModeDiff && !cols.contains(pk))
      throw new IllegalArgumentException(
        s"table '${t.name}': primary key '${t.primaryKey}' not in sync columns ${cols.mkString(", ")}")

    // Align file column types to the DB schema before diffing/writing:
    // the reference leans on MySQL's implicit coercion at INSERT time;
    // casting up front keeps the diff and strict JDBC drivers coherent.
    // A zero-column file (e.g. JSON `[]`) becomes an empty relation in
    // the DB's shape — the reference's empty-file fallback
    // (dbsync.go:447-459): overwrite clears, diff+deleteNotInFile
    // deletes everything, plain diff is a no-op.
    val dbSel = db.select(cols.map(col): _*)
    val fileSel =
      if (fileCols.isEmpty) dbSel.limit(0)
      else {
        val lowered = file.toDF(file.columns.map(_.toLowerCase): _*)
          .select(cols.map(col): _*)
        cols.foldLeft(lowered) { (d, c) =>
          val target = dbSel.schema(c).dataType
          if (d.schema(c).dataType == target) d
          else d.withColumn(c, col(c).cast(target))
        }
      }

    t.mode match {
      case SyncConfig.ModeOverwrite =>
        // Scale gate: count-probe threshold+1 rows (a count, not a
        // collect — learning "too big" must not itself spike driver
        // heap with threshold rows). At or below the threshold the
        // file collects and the strict single-transaction driver path
        // runs (reference parity); above it the whole file never
        // collects — the frame rides to the post-commit distributed
        // append. <= 0 keeps the driver path unconditionally.
        //
        // FK guard: the distributed reinsert lands AFTER the main
        // transaction commits, but tables DEPENDING on this one insert
        // their rows inside it — those inserts would reference parent
        // keys not yet reinserted. A table with configured dependents
        // therefore always takes the driver path, whatever its size.
        val hasDependents = config.tables.exists(_.dependencies.contains(t.name))
        val thr = config.overwriteDistributedThreshold
        // Persist ONE snapshot before probing: the probe, the exact
        // count and the post-commit append otherwise each re-evaluate
        // fileSel, so a source file rewritten mid-run could make the
        // reported insert count disagree with the rows written. The
        // cache pins the rows the probe saw; the append releases it.
        val snapshot =
          if (thr > 0 && thr < Int.MaxValue - 1 && !hasDependents)
            Some(fileSel.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          else None
        val probeCount = snapshot.fold(-1L)(_.limit(thr.toInt + 1).count())
        val dbN = if (config.dryRun) dbSel.count() else 0L
        if (probeCount > thr && probeCount >= 0)
          TableOps(t, cols, pk, Nil, Nil, Nil, Nil, dbN,
            overwriteDf = snapshot, overwriteCount = snapshot.get.count())
        else {
          val rows = snapshot.getOrElse(fileSel).collect()
          snapshot.foreach(_.unpersist(false))
          TableOps(t, cols, pk, Nil, Nil, Nil, rows.toSeq, dbN,
            overwriteCount = rows.length.toLong)
        }
      case _ =>
        PrimaryKeyValidator.validateStrict(fileSel, pk)
        // Change detection deliberately includes immutable columns —
        // the reference compares every sync column (dbsync.go:695-715)
        // and only excludes immutable ones from the UPDATE SET.
        val diff = Differ.diff(fileSel, dbSel, pk)
        val nonPk = cols.filterNot(_ == pk)
        val ins = diff.toInsert.select(cols.map(col): _*).collect().toSeq
        val upd = diff.toUpdate
          .select((cols.map(col) ++ nonPk.map(c => col(Differ.DbPrefix + c))): _*)
          .collect().toSeq
        val del =
          if (t.deleteNotInFile) diff.toDelete.select(cols.map(col): _*).collect().toSeq
          else Nil
        TableOps(t, cols, pk, ins, upd, del, Nil, 0L)
    }
  }

  private def planOnly(o: TableOps): SyncResult = {
    val t = o.cfg
    if (t.mode == SyncConfig.ModeOverwrite) {
      val plan = ExecutionPlan(t.name, o.overwriteCount, 0, o.dbCount,
        Nil, Nil, Nil, t.timestampColumns, t.immutableColumns)
      return SyncResult(t.name, t.mode, 0, 0, 0, Some(plan))
    }
    val lim = ExecutionPlan.SampleLimit
    // reference-parity value rendering (convertValueToString, incl.
    // Go 'g' floats); null keeps the explicit NULL marker for display
    def disp(v: Any): String = if (v == null) "NULL" else Canonical.goString(v)
    def fmt(r: Row): String =
      o.cols.map(c => s"$c=${disp(r.getAs[Any](c))}").mkString(", ")
    val nonPk = o.cols.filterNot(_ == o.pk)
    val updSamples = o.updRows.take(lim).map { r =>
      val changes = nonPk.flatMap { c =>
        val before = disp(r.getAs[Any](Differ.DbPrefix + c))
        val after = disp(r.getAs[Any](c))
        if (before == after) None
        else {
          val note = if (t.immutableColumns.contains(c)) " [immutable — skipped]" else ""
          Some(s"$c: $before -> $after$note")
        }
      }
      s"${o.pk}=${disp(r.getAs[Any](o.pk))}: ${changes.mkString("; ")}"
    }
    val plan = ExecutionPlan(
      t.name, o.insRows.size.toLong, o.updRows.size.toLong, o.delRows.size.toLong,
      o.insRows.take(lim).map(fmt), updSamples, o.delRows.take(lim).map(fmt),
      t.timestampColumns, t.immutableColumns)
    SyncResult(t.name, t.mode, 0, 0, 0, Some(plan))
  }
}
