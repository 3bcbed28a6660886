package graft.config

import scala.collection.mutable

/** Foreign-key dependency ordering for multi-table sync (reference
  * `config.go:367-584`): Kahn's algorithm with a deterministically
  * sorted queue, cycle detection with a concrete cycle path in the
  * error, and the derived two-phase orders — inserts parent->child,
  * deletes child->parent.
  *
  * Pure driver-side planning (the table count is tiny); the DataFrames
  * the order sequences can be arbitrarily large.
  */
final class DependencyGraph(deps: Map[String, Seq[String]]) {
  private val nodes: Seq[String] = deps.keys.toSeq.sorted

  /** Validate every dependency refers to a known table. */
  def unknownDependencies: Seq[(String, String)] =
    for {
      (t, ds) <- deps.toSeq.sortBy(_._1)
      d <- ds if !deps.contains(d)
    } yield (t, d)

  /** Kahn topological order, parents before children; sorted queue for
    * reproducible output. Throws with a concrete cycle on failure.
    */
  def topologicalOrder: Seq[String] = {
    val inDegree = mutable.Map(nodes.map(_ -> 0): _*)
    for ((t, ds) <- deps; _ <- ds) inDegree(t) += 1
    // children[p] = tables depending on p
    val children = mutable.Map[String, mutable.TreeSet[String]]()
    for ((t, ds) <- deps; d <- ds)
      children.getOrElseUpdate(d, mutable.TreeSet.empty) += t

    val queue = mutable.TreeSet(nodes.filter(inDegree(_) == 0): _*)
    val order = mutable.ArrayBuffer[String]()
    while (queue.nonEmpty) {
      val n = queue.head
      queue -= n
      order += n
      for (c <- children.getOrElse(n, mutable.TreeSet.empty[String])) {
        inDegree(c) -= 1
        if (inDegree(c) == 0) queue += c
      }
    }
    if (order.size != nodes.size) {
      throw new IllegalArgumentException(
        s"circular dependency detected: ${findCycle.mkString(" -> ")}")
    }
    order.toSeq
  }

  /** One concrete cycle for the error message (reference
    * `config.go:459-509` finds it via DFS).
    */
  private def findCycle: Seq[String] = {
    val color = mutable.Map(nodes.map(_ -> 0): _*) // 0 white 1 grey 2 black
    val stack = mutable.ArrayBuffer[String]()
    var cycle: Seq[String] = Seq.empty

    def dfs(n: String): Boolean = {
      color(n) = 1
      stack += n
      for (d <- deps.getOrElse(n, Nil).sorted if cycle.isEmpty) {
        if (color.getOrElse(d, 2) == 1) {
          cycle = stack.drop(stack.indexOf(d)).toSeq :+ d
          return true
        } else if (color.getOrElse(d, 2) == 0 && dfs(d)) return true
      }
      stack.remove(stack.size - 1)
      color(n) = 2
      false
    }

    nodes.foreach(n => if (color(n) == 0 && cycle.isEmpty) dfs(n))
    cycle
  }

  /** (insertOrder, deleteOrder): inserts run parent->child, deletes run
    * child->parent (reference `GetSyncOrder`, `config.go:562-584`).
    */
  def syncOrders: (Seq[String], Seq[String]) = {
    val topo = topologicalOrder
    (topo, topo.reverse)
  }
}
