package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{DependencyGraph, SyncConfig}

class ConfigSpec extends AnyFunSuite {

  test("topological order is deterministic and parent-first") {
    val g = new DependencyGraph(Map(
      "order_items" -> Seq("orders", "products"),
      "orders" -> Seq("customers"),
      "products" -> Seq("categories"),
      "customers" -> Nil,
      "categories" -> Nil,
      "warehouses" -> Nil))
    val topo = g.topologicalOrder
    assert(topo.indexOf("customers") < topo.indexOf("orders"))
    assert(topo.indexOf("orders") < topo.indexOf("order_items"))
    assert(topo.indexOf("categories") < topo.indexOf("products"))
    // sorted-queue determinism: the exact Kahn order is reproducible
    assert(topo == Seq("categories", "customers", "orders", "products",
      "order_items", "warehouses"))
    val (ins, del) = g.syncOrders
    assert(ins == topo && del == topo.reverse)
  }

  test("cycle detection names a concrete cycle") {
    val g = new DependencyGraph(Map(
      "a" -> Seq("b"), "b" -> Seq("c"), "c" -> Seq("a")))
    val e = intercept[IllegalArgumentException](g.topologicalOrder)
    assert(e.getMessage.contains("circular"))
    assert(e.getMessage.contains("->"))
  }

  test("unknown dependencies are reported") {
    val g = new DependencyGraph(Map("a" -> Seq("ghost")))
    assert(g.unknownDependencies == Seq(("a", "ghost")))
  }

  test("yaml single-table config with defaults") {
    val c = SyncConfig.fromYamlString(
      """db:
        |  url: jdbc:derby:memory:x
        |sync:
        |  filePath: /tmp/p.csv
        |  tableName: products
        |  primaryKey: id
        |  deleteNotInFile: true
        |  timestampColumns: [created_at, updated_at]
        |  immutableColumns: [created_at]
        |""".stripMargin)
    assert(c.tables.size == 1)
    val t = c.tables.head
    assert(t.name == "products" && t.mode == "diff" && t.deleteNotInFile)
    assert(t.timestampColumns == Seq("created_at", "updated_at"))
    assert(c.validate().isEmpty)
    assert(c.timeoutSeconds == 300) // reference main.go:61 default
  }

  test("yaml timeoutSeconds overrides the 5-minute default") {
    val c = SyncConfig.fromYamlString(
      """db: {url: jdbc:derby:memory:x}
        |timeoutSeconds: 42
        |sync: {filePath: /tmp/p.csv, tableName: t, mode: overwrite}
        |""".stripMargin)
    assert(c.timeoutSeconds == 42)
  }

  test("yaml dryRun key is honored") {
    val c = SyncConfig.fromYamlString(
      """db: {url: jdbc:derby:memory:x}
        |dryRun: true
        |sync: {filePath: /tmp/p.csv, tableName: t, mode: overwrite}
        |""".stripMargin)
    assert(c.dryRun)
  }

  test("yaml multi-table config and validation errors") {
    val c = SyncConfig.fromYamlString(
      """db: {url: jdbc:derby:memory:x}
        |tables:
        |  - {name: a, filePath: /tmp/a.csv, mode: diff, primaryKey: id}
        |  - {name: a, filePath: /tmp/a2.csv, mode: overwrite}
        |  - {name: b, filePath: /tmp/b.csv, mode: nope}
        |  - {name: c, filePath: '', mode: diff}
        |""".stripMargin)
    val errs = c.validate()
    assert(errs.exists(_.contains("duplicate table name 'a'")))
    assert(errs.exists(_.contains("unknown mode 'nope'")))
    assert(errs.exists(_.contains("filePath is required")))
    assert(errs.exists(_.contains("primaryKey is required")))
  }

  test("yaml config with circular dependencies fails validation") {
    val c = SyncConfig.fromYamlString(
      """db: {url: jdbc:derby:memory:x}
        |tables:
        |  - {name: a, filePath: /a.csv, mode: overwrite, dependencies: [b]}
        |  - {name: b, filePath: /b.csv, mode: overwrite, dependencies: [a]}
        |""".stripMargin)
    assert(c.validate().exists(_.contains("circular")))
  }
}
