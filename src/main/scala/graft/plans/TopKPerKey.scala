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
  *     `k / rowsPerKey` of the input;
  *   - Exchange (inserted by `EnsureRequirements` — the final node
  *     declares `ClusteredDistribution(keys)`);
  *   - [[TopKPerKeyFinalExec]]: merge the per-partition survivors,
  *     emit exactly k rows per key with a `rank` column, no sort of
  *     anything larger than a key's candidate set.
  *
  * No full sort ever happens; memory is bounded by k x (keys per
  * partition). This is the plan shape a 100 TB "top 3 documents per
  * domain" job needs — the window form is quadratic-ish in shuffle
  * volume at that scale.
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
  * the partition. Output schema/partitioning unchanged — this is the
  * map-side combine.
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
      TopKPerKeyExec.partitionHeaps(iter, keysL, orderL, kL, childOutput)
        .valuesIterator.flatMap(_.toSeq)
    }, preservesPartitioning = true)
  }
}

/** Key-clustered merge: per key, select the global top k from the
  * partial survivors and append a 1-based rank.
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
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (keysL, orderL, kL, childOutput, out) = (keys, order, k, child.output, output)
    child.execute().mapPartitions({ iter =>
      val ordering = GenerateOrdering.generate(orderL, childOutput)
      val proj = UnsafeProjection.create(out, out)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      TopKPerKeyExec.partitionHeaps(iter, keysL, orderL, kL, childOutput)
        .valuesIterator.flatMap { heap =>
          heap.toSeq.sorted(ordering).iterator.zipWithIndex.map { case (row, i) =>
            rankRow.setLong(0, i + 1L)
            proj(joined(row, rankRow)).copy(): InternalRow
          }
        }
    }, preservesPartitioning = true)
  }
}

private[plans] object TopKPerKeyExec {
  /** Shared heap pass: at most k rows per key, evicting the row that
    * sorts LAST (mutable.PriorityQueue dequeues the ordering's maximum,
    * which under an ascending comparator is exactly the worst row).
    */
  def partitionHeaps(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      childOutput: Seq[Attribute]): mutable.HashMap[InternalRow, mutable.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    val ordering = GenerateOrdering.generate(order, childOutput)
    val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val heap = heaps.getOrElseUpdate(
        keyProj(row).copy(),
        mutable.PriorityQueue.empty[InternalRow](ordering))
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ordering.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps
  }
}

/** Plans [[TopKPerKeyNode]] as partial-heaps -> exchange -> final. */
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
