package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Descending, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.LongType

/** Top-k rows per key as a first-class operator: logical node +
  * planner strategy + two physical operators.
  *
  * The DataFrame encoding of "top k per key" —
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k` —
  * shuffles EVERY row of the input and fully sorts every partition,
  * even though all but k rows per key are discarded. This operator
  * plans the same semantics the way partial aggregation plans `sum`:
  *
  *   - [[TopKPerKeyPartialExec]]: bounded per-key heaps per input
  *     partition, BEFORE the exchange — at most `k * distinctKeys`
  *     rows per partition survive, so the shuffle carries roughly
  *     `k / rowsPerKey` of the input. The heap map itself is bounded:
  *     past [[TopKPerKeyExec.FlushRows]] buffered rows it is flushed
  *     downstream and restarted (the final merge re-deduplicates), so
  *     a near-unique key column cannot pin a whole partition on the
  *     JVM heap;
  *   - Exchange + Sort (inserted by `EnsureRequirements` — the final
  *     node declares `ClusteredDistribution(keys)` and requires
  *     key-then-order sorted input; the sort spills);
  *   - [[TopKPerKeyFinalExec]]: one streaming pass over the sorted
  *     survivors — rank = position within the key group, emit the
  *     first k rows of each group. O(1) memory, no driver or
  *     executor-side materialization.
  *
  * No full sort of the input ever happens and no operator holds an
  * unbounded structure; this is the plan shape a 100 TB "top 3
  * documents per domain" job needs — the window form is quadratic-ish
  * in shuffle volume at that scale.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced here, not consumed from the child — without
  // this, TreeNode collects it into `references` (it is an Expression
  // constructor field) and CheckAnalysis flags it as missing input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Per-partition bounded top-k: keeps at most k rows per key seen in
  * the partition, flushing the heap map whenever it grows past
  * [[TopKPerKeyExec.FlushRows]] buffered rows. Output
  * schema/partitioning unchanged — this is the map-side combine.
  */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (keysL, orderL, kL, childOutput) = (keys, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      TopKPerKeyExec.partialTopK(iter, keysL, orderL, kL, childOutput,
        TopKPerKeyExec.FlushRows)
    }, preservesPartitioning = true)
  }
}

/** Key-clustered, key-sorted streaming finalizer: rows arrive grouped
  * by key and already in rank order (the required child ordering), so
  * rank is just the position inside the current group and everything
  * past k is skipped. Holds one key at a time — O(1) memory.
  */
case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil
  // grouped by key, then rank order within the group; the planner's
  // inserted SortExec spills, unlike a hash-of-heaps
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)
  // streaming filter over the child's rows: clustering and order
  // survive, so a downstream groupBy on the same keys needs no new
  // exchange (without these overrides UnaryExecNode reports
  // UnknownPartitioning and the planner re-shuffles)
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (keysL, kL, childOutput, out) = (keys, k, child.output, output)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysL, childOutput)
      val proj = UnsafeProjection.create(out, out)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var currentKey: InternalRow = null
      var rank = 0L
      iter.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          rank = 0L
        }
        rank += 1L
        if (rank <= kL) {
          rankRow.setLong(0, rank)
          Iterator.single(proj(joined(row, rankRow)).copy(): InternalRow)
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }
}

private[graft] object TopKPerKeyExec {

  /** Buffered-row bound for the partial heap map (~4M rows). Past this,
    * the map is flushed downstream and restarted; the final merge
    * re-ranks, so flushing never changes the result — it only trades a
    * little extra shuffle volume for bounded executor memory on
    * high-cardinality keys.
    */
  val FlushRows: Int = 4 * 1024 * 1024

  /** Bounded partial top-k pass: at most k rows per key, evicting the
    * row that sorts LAST (mutable.PriorityQueue dequeues the ordering's
    * maximum, which under an ascending comparator is exactly the worst
    * row), emitting and clearing the accumulated heaps whenever more
    * than `flushRows` rows are buffered.
    */
  def partialTopK(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      childOutput: Seq[Attribute],
      flushRows: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    val ordering = GenerateOrdering.generate(order, childOutput)
    new Iterator[InternalRow] {
      private val heaps =
        mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      private var nBuffered = 0
      private var out: Iterator[InternalRow] = Iterator.empty

      private def drain(): Iterator[InternalRow] = {
        val snapshot = heaps.values.toList
        heaps.clear()
        nBuffered = 0
        snapshot.iterator.flatMap(_.iterator)
      }

      override def hasNext: Boolean = {
        while (!out.hasNext && (iter.hasNext || nBuffered > 0)) {
          while (iter.hasNext && nBuffered < flushRows) {
            val row = iter.next()
            val heap = heaps.getOrElseUpdate(
              keyProj(row).copy(),
              mutable.PriorityQueue.empty[InternalRow](ordering))
            if (heap.size < k) {
              heap.enqueue(row.copy())
              nBuffered += 1
            } else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(row.copy())
            }
          }
          out = drain()
        }
        out.hasNext
      }

      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("empty iterator")
        out.next()
      }
    }
  }
}

/** Plans [[TopKPerKeyNode]] as partial-heaps -> exchange+sort -> final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKeyNode =>
      TopKPerKeyFinalExec(t.keys, t.order, t.k, t.rankAttr,
        TopKPerKeyPartialExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame entry point. */
object TopKPerKey {

  /** Sort key: column name + direction. */
  final case class Desc(name: String)
  final case class Asc(name: String)

  /** Top `k` rows per `keyCols` group ordered by `orderBy` (e.g.
    * `Seq(Desc("score"), Asc("id"))`), with a 1-based `rank` column
    * appended. Include a unique tiebreaker in `orderBy` for
    * deterministic output. Attributes are resolved eagerly against the
    * analyzed child, so the node enters the plan fully resolved (the
    * analyzer does not descend into foreign operators).
    */
  def topk(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Any],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // idempotent + race-free registration: planner.strategies also sees
    // strategies injected via GraftExtensions (experimental alone does
    // not), and the synchronized block keeps two concurrent callers
    // from losing an append
    TopKPerKey.synchronized {
      if (!spark.sessionState.planner.strategies.contains(TopKStrategy) &&
        !spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val sortOrders = orderBy.map {
      case Desc(n) => SortOrder(attr(n), Descending)
      case Asc(n) => SortOrder(attr(n), Ascending)
      case other => throw new IllegalArgumentException(
        s"orderBy entries must be Asc(name)/Desc(name), got $other")
    }
    val keys = keyCols.map(attr)
    val rankAttr = AttributeReference("rank", LongType, nullable = false)()
    graftbridge.ofRows(spark,
      TopKPerKeyNode(keys, sortOrders, k, rankAttr, analyzed))
  }
}
