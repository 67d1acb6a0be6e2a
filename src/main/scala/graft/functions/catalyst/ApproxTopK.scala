package graft.functions.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** SpaceSaving (Metwally et al.) summary: at most `capacity` counters;
  * an unseen item evicts the minimum counter and inherits its count as
  * error bound. Guarantees: estimate ∈ [true, true + err], and any item
  * with frequency > N/capacity is present. Exact (err = 0 for all items)
  * whenever distinct keys ≤ capacity. */
final class SpaceSaving(val capacity: Int) {
  val counters: mutable.HashMap[UTF8String, (Long, Long)] = mutable.HashMap.empty // item -> (count, err)

  def add(item: UTF8String, weight: Long = 1L): Unit = counters.get(item) match {
    case Some((c, e)) => counters.update(item, (c + weight, e))
    case None if counters.size < capacity => counters.update(item, (weight, 0L))
    case None =>
      val (mItem, (mCount, _)) = counters.minBy { case (i, (c, _)) => (c, i) }
      counters.remove(mItem)
      counters.update(item, (mCount + weight, mCount))
  }

  /** Standard summary merge: pointwise sums, then trim back to capacity by
    * evicting the smallest counters, folding their counts into the error of
    * nothing (they are simply dropped — their mass is already bounded by
    * the per-item err fields). Exact case (no eviction) stays exact. */
  def merge(other: SpaceSaving): SpaceSaving = {
    other.counters.foreach { case (i, (c, e)) =>
      counters.get(i) match {
        case Some((c0, e0)) => counters.update(i, (c0 + c, e0 + e))
        case None           => counters.update(i, (c, e))
      }
    }
    if (counters.size > capacity) {
      counters.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
        .drop(capacity).foreach { case (i, _) => counters.remove(i) }
    }
    this
  }
}

/** Approximate top-k frequent items over a string column, as a native
  * `TypedImperativeAggregate` — the engine's "novel sketch" extension tier
  * (mutable buffer, partial-agg + merge across partitions, binary
  * serialization between stages). Returns
  * `array<struct<item string, count long, err long>>` of the k most
  * frequent items (count desc, item asc — deterministic given exactness;
  * under eviction the estimates are partitioning-dependent, which is why
  * the oracle-checked query runs with capacity ≥ distinct keys where the
  * sketch is provably exact). */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[SpaceSaving] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType), StructField("err", LongType))))

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

  override def update(buffer: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].clone()) // unsafe-backed: copy
    buffer
  }

  override def merge(buffer: SpaceSaving, other: SpaceSaving): SpaceSaving = buffer.merge(other)

  override def eval(buffer: SpaceSaving): Any = {
    val top = buffer.counters.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(k)
      .map { case (i, (c, e)) => new GenericInternalRow(Array[Any](i, c, e)) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buffer: SpaceSaving): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.counters.size)
    buffer.counters.foreach { case (i, (c, e)) =>
      val b = i.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSaving(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.counters.update(UTF8String.fromBytes(b), (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ApproxTopK =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_topk"
}
