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

/** Per-group top-k as a PARTIAL aggregate (TypedImperativeAggregate):
  * each map task keeps only its local k best (score, id) pairs and the
  * shuffle carries k rows per group per task — the Window/row_number
  * formulation instead shuffles EVERY candidate row into one sorted
  * partition per group before discarding all but k. On an ANN rerank
  * with billions of candidate pairs this is the difference between a
  * k-bounded combine and a full sort of the candidate space.
  *
  * Ordering matches the Window formulation exactly, including edge
  * values: score rounded HALF_UP to 6dp (identical to Spark's `round`,
  * which passes NaN/Infinity through) descending with Spark's sort
  * semantics (NaN ranks above +Inf, nulls LAST as in `desc`), id
  * ascending as the tiebreak — so swapping the formulations cannot
  * change a result. The rounded ordering key is computed ONCE per
  * input row, never per comparison.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[TopKAgg.Entry]]
    with ImplicitCastInputTypes {

  import TopKAgg.Entry

  override def children: Seq[Expression] = Seq(score, id)
  // Seq is covariant, so the public DataType satisfies the
  // Seq[AbstractDataType] contract (AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  /** true when a ranks strictly better than b (desc by key, NULLS
    * LAST, NaN greatest — java.lang.Double.compare gives exactly
    * Spark's double sort order — then id asc). */
  private def better(a: Entry, b: Entry): Boolean =
    if (a.hasScore != b.hasScore) a.hasScore
    else if (a.hasScore) {
      val c = java.lang.Double.compare(a.key, b.key)
      c > 0 || (c == 0 && a.id < b.id)
    } else a.id < b.id

  override def createAggregationBuffer(): ArrayBuffer[Entry] = ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[Entry], e: Entry): Unit = {
    // buf kept sorted best-first, length ≤ k; k is small (≤ dozens) so
    // linear insertion beats heap constant factors
    var pos = 0
    while (pos < buf.length && !better(e, buf(pos))) pos += 1
    if (pos < k) {
      buf.insert(pos, e)
      if (buf.length > k) buf.remove(buf.length - 1)
    }
  }

  override def update(buf: ArrayBuffer[Entry], input: InternalRow): ArrayBuffer[Entry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (i != null) {
      val e =
        if (s == null) Entry(hasScore = false, 0.0, 0.0, i.asInstanceOf[Long])
        else {
          val raw = s.asInstanceOf[Double]
          Entry(hasScore = true, raw, TopKAgg.round6(raw), i.asInstanceOf[Long])
        }
      insert(buf, e)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Entry],
      other: ArrayBuffer[Entry]): ArrayBuffer[Entry] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[Entry]): Any =
    new GenericArrayData(buf.map { e =>
      InternalRow(e.id, if (e.hasScore) e.raw else null)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 17 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { e =>
      bb.put(if (e.hasScore) 1.toByte else 0.toByte)
      bb.putDouble(e.raw); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[Entry]
    var j = 0
    while (j < n) {
      val has = bb.get() == 1
      val raw = bb.getDouble
      val i = bb.getLong
      buf += (if (has) Entry(hasScore = true, raw, TopKAgg.round6(raw), i)
        else Entry(hasScore = false, 0.0, 0.0, i))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Buffer element: raw score for output, precomputed rounded
    * ordering key, id tiebreak. hasScore=false models a null score
    * (ranked last, like `desc` NULLS LAST). */
  final case class Entry(hasScore: Boolean, raw: Double, key: Double, id: Long)

  /** Floor-form 6dp rounding: ⌊d·10⁶ + 0.5⌋/10⁶ — single IEEE ops,
    * so the SAME value on every engine given the same double.
    * (BigDecimal HALF_UP — Spark's `round` — rounds the SHORTEST
    * DECIMAL string of the double instead of its binary value, which
    * can land one ulp differently from DuckDB's `round`; the floor
    * form has no such representational fork.) NaN/Infinity pass
    * through like Spark's round. */
  private[functions] def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else math.floor(d * 1e6 + 0.5) / 1e6

  /** Column API: aggregate to the k best (id, score) structs, ranked
    * by (⌊score·10⁶+0.5⌋ desc, id asc) — the ANN rerank contract,
    * replayed by the oracle with the identical floor expression. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
