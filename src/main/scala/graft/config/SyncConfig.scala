package graft.config

import java.io.FileInputStream
import java.util.{List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Sync configuration model (reference `config.go:21-218`).
  *
  * YAML shape:
  * {{{
  * db:
  *   url: jdbc:derby:memory:syncdb
  *   user: app
  *   password: secret
  * sync:                      # single-table form
  *   filePath: data/products.csv
  *   tableName: products
  *   mode: diff               # overwrite | diff
  *   primaryKey: id
  *   deleteNotInFile: true
  *   timestampColumns: [created_at, updated_at]
  *   immutableColumns: [created_at]
  *   columns: [id, name, price]
  * tables:                    # multi-table form (mutually exclusive)
  *   - name: products
  *     filePath: data/products.csv
  *     mode: diff
  *     primaryKey: id
  *     dependencies: [categories]
  * }}}
  */
final case class DbConfig(url: String, user: String = "", password: String = "") {
  def properties: java.util.Properties = {
    val p = new java.util.Properties()
    if (user.nonEmpty) p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    p
  }
}

final case class TableSyncConfig(
    name: String,
    filePath: String,
    mode: String = SyncConfig.ModeDiff,
    primaryKey: String = "",
    deleteNotInFile: Boolean = false,
    timestampColumns: Seq[String] = Nil,
    immutableColumns: Seq[String] = Nil,
    columns: Seq[String] = Nil,
    dependencies: Seq[String] = Nil)

final case class SyncConfig(
    db: DbConfig,
    tables: Seq[TableSyncConfig],
    dryRun: Boolean = false,
    // Whole-run wall-clock bound, reference `main.go:59-62`
    // (context.WithTimeout, 5 minutes). <= 0 disables the deadline.
    timeoutSeconds: Long = 300,
    // Overwrite-mode scale gate: at or below this many file rows the
    // overwrite reinserts through the driver's single transaction
    // (strict reference parity — all-or-nothing with every other
    // table's writes); above it the rows never collect to the driver
    // and the reinsert runs through Spark's parallel JDBC writer
    // AFTER the main transaction commits (documented relaxation: the
    // cleared table fills in per-partition commits, so a mid-append
    // failure leaves a partially loaded overwrite table rather than a
    // rolled-back one). <= 0 forces the driver path for any size.
    overwriteDistributedThreshold: Long = 500000) {
  def isMultiTable: Boolean = tables.size > 1

  /** Validation rules of the reference (`config.go:142-365`): required
    * fields, known modes, PK required for diff mode, duplicate table
    * names, unknown and circular dependencies. Returns every violation.
    */
  def validate(): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    if (db.url.isEmpty) errs += "db.url is required"
    if (tables.isEmpty) errs += "at least one sync table is required"
    for (t <- tables) {
      if (t.name.isEmpty) errs += "table name is required"
      if (t.filePath.isEmpty) errs += s"table '${t.name}': filePath is required"
      if (!SyncConfig.Modes.contains(t.mode))
        errs += s"table '${t.name}': unknown mode '${t.mode}' (expected overwrite|diff)"
      if (t.mode == SyncConfig.ModeDiff && t.primaryKey.isEmpty)
        errs += s"table '${t.name}': primaryKey is required in diff mode"
      if (t.deleteNotInFile && t.mode != SyncConfig.ModeDiff)
        errs += s"table '${t.name}': deleteNotInFile requires diff mode"
    }
    val dups = tables.groupBy(_.name).collect { case (n, ts) if ts.size > 1 => n }
    dups.toSeq.sorted.foreach(n => errs += s"duplicate table name '$n'")
    if (errs.isEmpty) {
      val graph = new DependencyGraph(tables.map(t => t.name -> t.dependencies).toMap)
      graph.unknownDependencies.foreach { case (t, d) =>
        errs += s"table '$t' depends on unknown table '$d'"
      }
      if (graph.unknownDependencies.isEmpty) {
        try graph.topologicalOrder
        catch { case e: IllegalArgumentException => errs += e.getMessage }
      }
    }
    errs.toSeq
  }

  def validated(): SyncConfig = {
    val errs = validate()
    if (errs.nonEmpty)
      throw new IllegalArgumentException(
        s"invalid sync config:\n  ${errs.mkString("\n  ")}")
    this
  }
}

object SyncConfig {
  val ModeOverwrite = "overwrite"
  val ModeDiff = "diff"
  val Modes: Set[String] = Set(ModeOverwrite, ModeDiff)

  def fromYamlFile(path: String): SyncConfig = {
    val in = new FileInputStream(path)
    try fromYaml(new Yaml().load[JMap[String, AnyRef]](in))
    finally in.close()
  }

  def fromYamlString(yaml: String): SyncConfig =
    fromYaml(new Yaml().load[JMap[String, AnyRef]](yaml))

  private def str(m: Map[String, AnyRef], k: String, dflt: String = ""): String =
    m.get(k).map(String.valueOf).getOrElse(dflt)

  private def bool(m: Map[String, AnyRef], k: String): Boolean =
    m.get(k).exists {
      case b: java.lang.Boolean => b.booleanValue()
      case s => String.valueOf(s).toBoolean
    }

  private def strs(m: Map[String, AnyRef], k: String): Seq[String] =
    m.get(k) match {
      case Some(l: JList[_]) => l.asScala.map(String.valueOf).toSeq
      case _ => Nil
    }

  private def asMap(v: AnyRef): Map[String, AnyRef] = v match {
    case m: JMap[_, _] => m.asScala.map { case (k, vv) =>
      String.valueOf(k) -> vv.asInstanceOf[AnyRef]
    }.toMap
    case _ => Map.empty
  }

  private def tableFrom(m: Map[String, AnyRef], nameKey: String): TableSyncConfig =
    TableSyncConfig(
      name = str(m, nameKey),
      filePath = str(m, "filePath"),
      mode = str(m, "mode", ModeDiff),
      primaryKey = str(m, "primaryKey"),
      deleteNotInFile = bool(m, "deleteNotInFile"),
      timestampColumns = strs(m, "timestampColumns"),
      immutableColumns = strs(m, "immutableColumns"),
      columns = strs(m, "columns"),
      dependencies = strs(m, "dependencies"))

  private def fromYaml(root: JMap[String, AnyRef]): SyncConfig = {
    val r = Option(root).map(_.asScala.toMap.map { case (k, v) => k -> v })
      .getOrElse(Map.empty[String, AnyRef])
    val dbm = asMap(r.getOrElse("db", new java.util.HashMap[String, AnyRef]()))
    val db = DbConfig(str(dbm, "url"), str(dbm, "user"), str(dbm, "password"))
    val tables = r.get("tables") match {
      case Some(l: JList[_]) =>
        l.asScala.toSeq.map(t => tableFrom(asMap(t.asInstanceOf[AnyRef]), "name"))
      case _ =>
        r.get("sync").toSeq.map { s =>
          val m = asMap(s)
          tableFrom(m, "tableName")
        }
    }
    val timeout = r.get("timeoutSeconds")
      .map(v => String.valueOf(v).toLong).getOrElse(300L)
    val owThr = r.get("overwriteDistributedThreshold")
      .map(v => String.valueOf(v).toLong).getOrElse(500000L)
    SyncConfig(db, tables, dryRun = bool(r, "dryRun"),
      timeoutSeconds = timeout,
      overwriteDistributedThreshold = owThr)
  }
}
