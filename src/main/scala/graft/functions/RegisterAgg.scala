package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise MAX over fixed-width int-array registers as a PARTIAL
  * aggregate — the HyperANF merge (Boldi, Rosa & Vigna, WWW 2011;
  * reference: the neighbourhood-function queries around
  * src/neo4j/call_path_analyzer.rs): each map task folds every
  * neighbor's m-register sketch into ONE m-int buffer per node before
  * the shuffle, so a round ships n·m ints instead of the exploded
  * 64×|E| (node, idx, ρ) rows the row-form merge shuffles. Same
  * max-per-register semantics bit for bit — only the carrier shape
  * changes (the kmeansIterate de-explosion lesson applied to register
  * sketches).
  *
  * Null input arrays are skipped (no registers to contribute); an
  * empty group evaluates to the all-zero register bank, which the
  * HLL estimator reads as "nothing seen".
  */
case class RegisterMax(
    regs: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(regs)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  private def foldIn(buf: Array[Int], arr: ArrayData): Array[Int] = {
    val n = math.min(m, arr.numElements())
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      if (v > buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val a = regs.eval(input)
    if (a == null) buf else foldIn(buf, a.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    new GenericArrayData(buf.map(Int.box))

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * m)
    var i = 0
    while (i < m) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bb.getInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(regs = newChildren(0))
}

object RegisterAgg {

  /** Column API: element-wise max of `m`-int register arrays. */
  def registerMax(regs: Column, m: Int): Column =
    ColumnBridge.column(
      RegisterMax(ColumnBridge.expression(regs), m).toAggregateExpression())
}
