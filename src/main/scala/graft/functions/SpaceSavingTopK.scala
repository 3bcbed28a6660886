package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters sketch buffer: SpaceSaving (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams").
  * `counts` maps item -> (count, maxError). At most `capacity` entries.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  require(capacity > 0, s"capacity must be positive, got $capacity")
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  // Eviction scans all `capacity` entries for the minimum — O(capacity)
  // per unseen item once full. Fine for the typical capacities (<= a
  // few thousand); a stream-summary structure (Metwally et al. §3)
  // would make it O(1) if profiling ever shows this hot.
  def add(item: String, inc: Long = 1L): Unit =
    counts.get(item) match {
      case Some((c, e)) => counts.update(item, (c + inc, e))
      case None if counts.size < capacity => counts.update(item, (inc, 0L))
      case None =>
        // evict the minimum-count entry; the newcomer inherits its
        // count as error bound
        val (minItem, (minC, _)) = counts.minBy { case (k, (c, _)) => (c, k) }
        counts.remove(minItem)
        counts.update(item, (minC + inc, minC))
    }

  /** Parallel SpaceSaving merge (Cafaro et al.): an item absent from a
    * FULL sketch may have been evicted with count up to that sketch's
    * minimum, so the absent side contributes its min count to both the
    * estimate and the error bound. Keeps the overestimate invariant
    * `true <= cnt <= true + err` for every reported item; sketches that
    * never filled contribute 0 (exact regime stays exact).
    */
  def merge(other: SpaceSavingBuffer): Unit = {
    def minOf(b: SpaceSavingBuffer): Long =
      if (b.counts.size >= b.capacity) b.counts.valuesIterator.map(_._1).min else 0L
    val m1 = minOf(this)
    val m2 = minOf(other)
    val keys = counts.keySet ++ other.counts.keySet
    val merged = keys.toSeq.map { k =>
      val (c1, e1) = counts.getOrElse(k, (m1, m1))
      val (c2, e2) = other.counts.getOrElse(k, (m2, m2))
      k -> (c1 + c2, e1 + e2)
    }
    counts.clear()
    merged.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      .foreach { case (k, v) => counts.update(k, v) }
  }
}

/** `topk_freq(expr, k, capacity)`: approximate top-k most frequent
  * values with SpaceSaving. Returns `array<struct<item, cnt, err>>`
  * sorted by (cnt desc, item asc), truncated to k.
  *
  * Guarantees: per-item `cnt` overestimates the true count by at most
  * `err`; when the number of distinct items never exceeds `capacity`,
  * `err` is 0 and the result is EXACT — which is how the oracle checks
  * it. Partial aggregation works map-side like any hash aggregate, so
  * the shuffle carries one `capacity`-bounded sketch per partition
  * instead of one row per distinct item — the point of the sketch at
  * 100 TB.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {
  require(k > 0, s"k must be positive, got $k")
  require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")

  override def prettyName: String = "topk_freq"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("cnt", LongType),
    StructField("err", LongType))))

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.toString)
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.merge(o)
    b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val top = b.counts.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e)
      }
    new GenericArrayData(top.toArray[Any])
  }

  // length-prefixed UTF-8 (writeUTF caps items at 64 KB modified-UTF-8
  // and would fail on large values, e.g. whole-document items)
  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (item, (c, e)) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val item = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      b.counts.update(item, (in.readLong(), in.readLong()))
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SpaceSavingTopK = copy(child = c.head)
}

object SpaceSavingTopK {
  /** Column API: `topkFreq(col, k, capacity)` aggregate. */
  def topkFreq(c: Column, k: Int, capacity: Int): Column =
    graftbridge.column(
      SpaceSavingTopK(graftbridge.expression(c), k, capacity)
        .toAggregateExpression())
}
