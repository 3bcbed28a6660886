package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.config.DbConfig
import graft.core.DiffOperations

/** Transactional JDBC sync sink.
  *
  * Spark's built-in JDBC writer can only append/overwrite and commits
  * per partition; the reference requires UPDATE, targeted DELETE, and
  * ALL-OR-NOTHING semantics across every operation (and across every
  * table in multi-table mode — `dbsync.go:917-930`). The design
  * (SURVEY §7.4): diff outputs are *small by construction* (changed
  * rows only), so they are collected to the driver and replayed over
  * ONE JDBC connection in ONE transaction — multi-row INSERT
  * (`dbsync.go:783-827`), prepared-statement UPDATE reuse
  * (`dbsync.go:830-891`), chunked IN-list DELETE (`dbsync.go:895-913`)
  * — then committed once.
  *
  * Scale path: when a diff is NOT small (bulk backfill), use
  * [[appendDistributed]] for the insert set — Spark's parallel JDBC
  * writer with batched statements — and stage updates into a temp
  * table merged by the database (semantics-relaxing: per-partition
  * commits). The single-tx path is the parity default.
  */
object JdbcSyncWriter {

  /** Rows collected per JDBC batch execution. */
  val BatchSize = 1000
  /** Max keys per DELETE ... IN (...) statement. */
  val DeleteChunk = 1000

  def connect(db: DbConfig): Connection = {
    val c = DriverManager.getConnection(db.url, db.properties)
    c.setAutoCommit(false)
    c
  }

  /** SQL identifiers interpolated into DDL/DML built here must be plain
    * (letters, digits, underscore, optional schema qualifier): they come
    * from config, not user data, and quoting would change case semantics
    * across Derby/MySQL/Postgres. Reject anything else.
    */
  private[sinks] def requirePlainIdentifier(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"),
      s"unsafe SQL identifier: '$name'")
    name
  }

  /** Table existence via JDBC metadata — no failed-statement probing,
    * which on Postgres would abort the open transaction.
    *
    * getTables takes LIKE patterns, so `_`/`%` in the name are escaped
    * with the driver's escape string; a `schema.table` name probes that
    * schema, an unqualified name probes the connection's current schema
    * (falling back to any schema only when the driver reports none) —
    * otherwise a same-named table elsewhere would shadow the verdict.
    */
  def tableExists(conn: Connection, table: String): Boolean = {
    val md = conn.getMetaData
    // escape LIKE wildcards where the driver supports it (Derby reports
    // an EMPTY escape string — no escaping possible there)
    val esc = Option(md.getSearchStringEscape).filter(_.nonEmpty)
    def pat(n: String): String = esc match {
      case Some(e) => n.replace(e, e + e).replace("_", e + "_").replace("%", e + "%")
      case None => n
    }
    val (schema, name) = table.split("\\.") match {
      case Array(sc, t) => (Some(sc), t)
      case _ =>
        (try Option(conn.getSchema) catch { case _: Exception => None }, table)
    }
    // the pattern over-matches when escaping is unavailable ('_' is a
    // one-char wildcard), so every hit is re-checked EXACTLY against
    // the requested name (case-insensitive: unquoted identifiers are
    // case-normalized differently per catalog)
    def probe(n: String): Boolean = {
      val rs = md.getTables(null, schema.map(pat).orNull, pat(n), Array("TABLE"))
      try {
        var found = false
        while (!found && rs.next()) {
          val tn = rs.getString("TABLE_NAME")
          found = tn != null && tn.equalsIgnoreCase(name)
        }
        found
      } finally rs.close()
    }
    probe(name) || probe(name.toUpperCase) || probe(name.toLowerCase)
  }

  /** Live table columns in ordinal order via JDBC metadata (reference
    * `getTableColumns`, `dbsync.go:253-279`).
    */
  def tableColumns(conn: Connection, table: String): Seq[String] = {
    val rs = conn.getMetaData.getColumns(null, null, table.toUpperCase, null)
    val buf = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    while (rs.next())
      buf += ((rs.getInt("ORDINAL_POSITION"), rs.getString("COLUMN_NAME")))
    rs.close()
    if (buf.nonEmpty) buf.sortBy(_._1).map(_._2.toLowerCase).toSeq
    else {
      // fall back to exact-case lookup for case-sensitive catalogs
      val rs2 = conn.getMetaData.getColumns(null, null, table, null)
      val b2 = scala.collection.mutable.ArrayBuffer[(Int, String)]()
      while (rs2.next())
        b2 += ((rs2.getInt("ORDINAL_POSITION"), rs2.getString("COLUMN_NAME")))
      rs2.close()
      b2.sortBy(_._1).map(_._2.toLowerCase).toSeq
    }
  }

  /** Current DB state as a DataFrame (reference `getCurrentDBData`,
    * `dbsync.go:597-679` — but a lazy scan, not a driver-side map).
    */
  def readTable(spark: SparkSession, db: DbConfig, table: String): DataFrame =
    spark.read.jdbc(db.url, table, db.properties)

  /** Parallel partitioned JDBC read: `numPartitions` concurrent range
    * scans over a numeric `partitionColumn`. This is how the DB side of
    * a big-table diff avoids the single-connection bottleneck — each
    * executor pulls its own key range (the scalability lift over the
    * reference's full-table single SELECT, `dbsync.go:617-619`).
    */
  def readTablePartitioned(
      spark: SparkSession,
      db: DbConfig,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(db.url, table, partitionColumn,
      lowerBound, upperBound, numPartitions, db.properties)

  private def setParam(ps: PreparedStatement, i: Int, v: Any): Unit = v match {
    case null => ps.setObject(i, null)
    case t: Timestamp => ps.setTimestamp(i, t)
    case t: java.time.Instant => ps.setTimestamp(i, Timestamp.from(t))
    case t: java.time.LocalDateTime => ps.setTimestamp(i, Timestamp.valueOf(t))
    case d: java.sql.Date => ps.setDate(i, d)
    case other => ps.setObject(i, other)
  }

  /** Multi-row INSERT of collected rows. Timestamp columns not already
    * in the column set are appended and set to now() (reference
    * `dbsync.go:793-818`).
    */
  def bulkInsert(
      conn: Connection,
      table: String,
      cols: Seq[String],
      rows: Seq[Row],
      timestampCols: Seq[String] = Nil): Int = {
    if (rows.isEmpty) return 0
    val extraTs = timestampCols.filterNot(cols.contains)
    val allCols = cols ++ extraTs
    val placeholders = allCols.map(_ => "?").mkString("(", ", ", ")")
    val sql = s"INSERT INTO $table (${allCols.mkString(", ")}) VALUES $placeholders"
    val ps = conn.prepareStatement(sql)
    try {
      val now = Timestamp.from(java.time.Instant.now())
      var n = 0
      rows.foreach { r =>
        cols.zipWithIndex.foreach { case (c, i) =>
          setParam(ps, i + 1, r.getAs[Any](c))
        }
        extraTs.zipWithIndex.foreach { case (_, i) =>
          ps.setTimestamp(cols.size + i + 1, now)
        }
        ps.addBatch()
        n += 1
        if (n % BatchSize == 0) ps.executeBatch()
      }
      ps.executeBatch()
      rows.size
    } finally ps.close()
  }

  /** Prepared-statement UPDATE per row (batched). The SET list excludes
    * the PK and immutable columns; timestamp columns are refreshed to
    * now() except immutable ones (reference `dbsync.go:830-891`).
    */
  def bulkUpdate(
      conn: Connection,
      table: String,
      cols: Seq[String],
      pk: String,
      rows: Seq[Row],
      timestampCols: Seq[String] = Nil,
      immutableCols: Seq[String] = Nil): Int = {
    if (rows.isEmpty) return 0
    val setCols = cols.filterNot(c => c == pk || immutableCols.contains(c))
    val extraTs = timestampCols.filterNot(c => cols.contains(c) || immutableCols.contains(c))
    // A row can reach toUpdate with nothing settable (the reference
    // compares immutable columns too, it just never writes them) —
    // an empty SET list would be malformed SQL, so skip.
    if (setCols.isEmpty && extraTs.isEmpty) return 0
    val setList = (setCols.map(c => s"$c = ?") ++ extraTs.map(c => s"$c = ?")).mkString(", ")
    val sql = s"UPDATE $table SET $setList WHERE $pk = ?"
    val ps = conn.prepareStatement(sql)
    try {
      val now = Timestamp.from(java.time.Instant.now())
      var n = 0
      rows.foreach { r =>
        var i = 1
        setCols.foreach { c => setParam(ps, i, r.getAs[Any](c)); i += 1 }
        extraTs.foreach { _ => ps.setTimestamp(i, now); i += 1 }
        setParam(ps, i, r.getAs[Any](pk))
        ps.addBatch()
        n += 1
        if (n % BatchSize == 0) ps.executeBatch()
      }
      ps.executeBatch()
      rows.size
    } finally ps.close()
  }

  /** Chunked DELETE ... WHERE pk IN (...) (reference `dbsync.go:895-913`). */
  def bulkDelete(
      conn: Connection,
      table: String,
      pk: String,
      keys: Seq[Any]): Int = {
    if (keys.isEmpty) return 0
    keys.grouped(DeleteChunk).foreach { chunk =>
      val sql = s"DELETE FROM $table WHERE $pk IN (${chunk.map(_ => "?").mkString(", ")})"
      val ps = conn.prepareStatement(sql)
      try {
        chunk.zipWithIndex.foreach { case (k, i) => setParam(ps, i + 1, k) }
        ps.executeUpdate()
      } finally ps.close()
    }
    keys.size
  }

  /** Transactional DELETE-all (DELETE, not TRUNCATE, so it stays inside
    * the transaction — reference `dbsync.go:494-518`).
    */
  def deleteAll(conn: Connection, table: String): Int = {
    val st = conn.createStatement()
    try st.executeUpdate(s"DELETE FROM $table")
    finally st.close()
  }

  /** Transactional DELETE-all + reinsert (overwrite mode). */
  def overwrite(
      conn: Connection,
      table: String,
      cols: Seq[String],
      rows: Seq[Row],
      timestampCols: Seq[String] = Nil): Int = {
    deleteAll(conn, table)
    bulkInsert(conn, table, cols, rows, timestampCols)
  }

  /** Apply a three-way diff inside the caller's open transaction:
    * insert, update, delete — in that order, like the reference's
    * `executeSyncOperations` (`dbsync.go:532-565`). Does NOT commit.
    */
  def applyDiff(
      conn: Connection,
      table: String,
      cols: Seq[String],
      pk: String,
      diff: DiffOperations,
      timestampCols: Seq[String] = Nil,
      immutableCols: Seq[String] = Nil): (Int, Int, Int) = {
    val colCols = cols.map(org.apache.spark.sql.functions.col)
    val ins = diff.toInsert.select(colCols: _*).collect().toSeq
    val upd = diff.toUpdate.select(colCols: _*).collect().toSeq
    val del = diff.toDelete.select(pk).collect().map(_.get(0)).toSeq
    (
      bulkInsert(conn, table, cols, ins, timestampCols),
      bulkUpdate(conn, table, cols, pk, upd, timestampCols, immutableCols),
      bulkDelete(conn, table, pk, del))
  }

  /** Scale-out append: Spark's parallel JDBC writer (executors write
    * batched inserts concurrently). Use for large insert sets where
    * per-partition commit semantics are acceptable.
    */
  def appendDistributed(df: DataFrame, db: DbConfig, table: String,
      batchSize: Int = BatchSize): Unit =
    df.write
      .mode("append")
      .option("batchsize", batchSize)
      .jdbc(db.url, table, db.properties)

  /** Scale-out upsert: stage the upsert set through Spark's parallel
    * JDBC writer, then run ONE set-based MERGE inside the database.
    *
    * This is the path for diffs too large to collect to the driver:
    * executors load the staging table concurrently (per-partition
    * commits — the staging table is scratch, so that is harmless), and
    * the visible table changes in a single atomic MERGE statement.
    * Works on any MERGE-capable target (Derby, MySQL 8 via its upsert
    * dialects, Postgres 15+, ...).
    *
    * Returns the number of rows merged (staged row count).
    */
  def mergeViaStaging(
      df: DataFrame,
      db: DbConfig,
      table: String,
      pk: String,
      cols: Seq[String],
      batchSize: Int = BatchSize): Long = {
    requirePlainIdentifier(table)
    (pk +: cols).foreach(requirePlainIdentifier)
    val staging = s"${table}_graft_stage"
    val conn = connect(db)
    try {
      val st = conn.createStatement()
      // metadata probe, not a speculative DROP: a failed statement aborts
      // the open transaction on Postgres (autocommit is off)
      if (tableExists(conn, staging)) st.executeUpdate(s"DROP TABLE $staging")
      st.executeUpdate(
        s"CREATE TABLE $staging AS SELECT ${cols.mkString(", ")} FROM $table WITH NO DATA")
      conn.commit()
      st.close()
    } finally conn.close()

    val staged = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    staged.write.mode("append").option("batchsize", batchSize)
      .jdbc(db.url, staging, db.properties)

    val conn2 = connect(db)
    try {
      val nonPk = cols.filterNot(_ == pk)
      val setList = nonPk.map(c => s"t.$c = s.$c").mkString(", ")
      val insertCols = cols.mkString(", ")
      val insertVals = cols.map(c => s"s.$c").mkString(", ")
      val st = conn2.createStatement()
      st.executeUpdate(
        s"""MERGE INTO $table t USING $staging s ON t.$pk = s.$pk
           |WHEN MATCHED THEN UPDATE SET $setList
           |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $staging")
      rs.next()
      val n = rs.getLong(1)
      st.executeUpdate(s"DROP TABLE $staging")
      conn2.commit()
      st.close()
      n
    } catch {
      case e: Throwable => conn2.rollback(); throw e
    } finally conn2.close()
  }
}
