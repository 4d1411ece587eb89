package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-group CAPPED distinct-set collector (TypedImperativeAggregate):
  * keeps the `limit` SMALLEST distinct long values seen, as a sorted
  * ascending array. "Smallest-limit" is a semilattice (merge = union
  * then re-truncate), so map-side partials are exact at any split:
  * each map task ships ≤ limit longs per group instead of every raw
  * row — `distinct() + collect_list` shuffles the whole input AND
  * materializes unbounded per-group arrays before any cap can apply
  * (one hot key with 10⁹ members = a multi-GB row; the cap here bounds
  * the buffer at limit everywhere, map side included).
  *
  * The caller reads overflow from the size: a group returning exactly
  * `limit` values had AT LEAST limit distinct members (maybe more —
  * truncated); any smaller array is the COMPLETE distinct set. Pass
  * limit = cap+1 to implement "drop groups with more than cap
  * members" losslessly.
  */
case class BoundedDistinctLongs(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Long]]
    with ImplicitCastInputTypes {

  require(limit >= 1, "limit must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  /** Sorted-ascending insert-if-absent, truncated to the limit
    * smallest; limit is small (cap+1, ≤ dozens) so binary search +
    * linear shift beats set/heap constant factors. */
  private def insert(buf: ArrayBuffer[Long], v: Long): Unit = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == v) return // already present
    if (lo < limit) {
      buf.insert(lo, v)
      if (buf.length > limit) buf.remove(buf.length - 1)
    }
  }

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[Long],
      other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var j = 0
    while (j < n) { buf += bb.getLong; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object BoundedSetAgg {
  /** Column API: sorted ascending array of the `limit` smallest
    * distinct values of `value` per group. */
  def boundedDistinct(value: Column, limit: Int): Column =
    ColumnBridge.column(
      BoundedDistinctLongs(ColumnBridge.expression(value), limit)
        .toAggregateExpression())
}
