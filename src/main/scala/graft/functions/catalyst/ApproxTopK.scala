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

  /** Weighted insert with SpaceSaving eviction: an absent item inherits the
    * evicted minimum count as additional (over)estimate and error — this is
    * what preserves `true ≤ estimate ≤ true + err` under any merge order. */
  def add(item: UTF8String, weight: Long = 1L, err: Long = 0L): Unit = counters.get(item) match {
    case Some((c, e)) => counters.update(item, (c + weight, e + err))
    case None if counters.size < capacity => counters.update(item, (weight, err))
    case None =>
      val (mItem, (mCount, _)) = counters.minBy { case (i, (c, _)) => (c, i) }
      counters.remove(mItem)
      counters.update(item, (mCount + weight, mCount + err))
  }

  /** Merge = replay the other summary's counters through the weighted
    * [[add]] path. Evicted mass is inherited, never dropped, so the
    * overestimate invariant survives merging (dropping trimmed counters
    * outright would let an item re-enter later with a fresh underestimate).
    * Exact case (total distinct ≤ capacity: no eviction anywhere) stays
    * exact and merge-order independent. */
  def merge(other: SpaceSaving): SpaceSaving = {
    other.counters.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) } // deterministic replay order
      .foreach { case (i, (c, e)) => add(i, c, e) }
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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires a string column, got ${child.dataType}")
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
