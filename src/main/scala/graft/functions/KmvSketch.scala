package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) buffer: the `k` smallest DISTINCT hash
  * values seen so far (Beyer et al., SIGMOD'07). Bounded at `k`
  * longs; merging two buffers is just re-adding one side's values —
  * the sketch of a union is the merge of the sketches, which is what
  * makes it a valid partial aggregate.
  */
final class KmvBuffer(val k: Int) {
  require(k > 0, s"k must be positive, got $k")
  val set: mutable.TreeSet[Long] = mutable.TreeSet.empty

  def add(h: Long): Unit =
    if (!set.contains(h)) {
      if (set.size < k) set += h
      else if (h < set.last) { set -= set.last; set += h }
    }

  def merge(o: KmvBuffer): Unit = o.set.foreach(add)
}

/** `kmv_hashes(hashExpr, k)`: aggregate the `k` smallest distinct
  * values of an integral hash column into a sorted array — the KMV
  * distinct sketch as a first-class mergeable aggregate.
  *
  * The child must already BE the hash (e.g.
  * `hex_prefix(md5(term))`) — taking the hash as input keeps the
  * aggregate one-argument, composable with the engine's shared
  * hashing conventions, and trivially mirrored by the SQL oracle
  * (`ROW_NUMBER() OVER (ORDER BY h) <= k`).
  *
  * Why an aggregate and not a top-k query: partial aggregation. Every
  * map task reduces its partition to ≤ k longs BEFORE the shuffle, so
  * a distinct-count estimate over 100 TB moves `partitions · k` longs
  * — the same property [[SpaceSavingTopK]] gives heavy hitters. The
  * estimate itself stays exact arithmetic on the array: `n < k` rows
  * → exactly `n` distinct hashes seen; otherwise `(k−1)·2³² / h_(k)`.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {
  require(k > 0, s"k must be positive, got $k")

  override def prettyName: String = "kmv_hashes"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    b.merge(o)
    b
  }

  override def eval(b: KmvBuffer): Any =
    new GenericArrayData(b.set.toArray[Long])

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.set.size)
    b.set.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => b.set += in.readLong())
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvSketch = copy(child = c.head)
}

object KmvSketch {
  /** Column API: `kmvHashes(hashCol, k)` aggregate. */
  def kmvHashes(c: Column, k: Int): Column =
    graftbridge.column(
      KmvSketch(graftbridge.expression(c), k).toAggregateExpression())
}
