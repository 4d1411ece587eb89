package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused per-vector int8 quantization statistics — ONE primitive pass
  * replacing the 6 interpreted higher-order-function passes of the
  * r15 quantizeInt8/quantizeSummary chain (cast transform, maxabs
  * aggregate, codes transform, two code folds, zip_with err² fold;
  * each allocated a boxed intermediate array per row).
  *
  * Exactness contract (the oracle replays every piece):
  * - element cast float→double is the exact IEEE widening the old
  *   `transform(v, cast)` performed;
  * - maxabs is the sequential `greatest(acc, abs(x))` fold from 0.0
  *   (Math.max is bit-identical for the non-NaN inputs the corpus
  *   contract guarantees — same precondition as SquaredL2Distance:
  *   fixed-width, non-null elements);
  * - codes_i replays Spark's `round(x·127/maxabs, 0)` verbatim:
  *   BigDecimal over the double's SHORTEST DECIMAL string, HALF_UP —
  *   the same scala BigDecimal call Round's DoubleType branch makes —
  *   then the non-failing long cast (values live in [−127, 127]);
  * - err² is the zip_with arithmetic in evaluation order:
  *   (x − (code·maxabs)/127)², summed left to right;
  * - code_sum / code_sq_sum are the exact long folds.
  *
  * NULL vector → NULL struct (each downstream field read yields NULL,
  * exactly what each HOF form produced on a NULL input).
  */
case class QuantizeInt8Stats(child: Expression) extends UnaryExpression {

  // lazy: dataType is only legal on a RESOLVED child (the Column API
  // builds this over an UnresolvedAttribute)
  @transient private lazy val floatIn: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("maxabs", DoubleType, nullable = false),
    StructField("codes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err2", DoubleType, nullable = false),
    StructField("code_sum", LongType, nullable = false),
    StructField("code_sq_sum", LongType, nullable = false)))

  private def elem(a: ArrayData, i: Int): Double =
    if (floatIn) a.getFloat(i).toDouble else a.getDouble(i)

  def computeJava(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val ax = math.abs(elem(a, i))
      maxabs = math.max(maxabs, ax)
      i += 1
    }
    val codes = new Array[Long](n)
    if (maxabs != 0.0) {
      i = 0
      while (i < n) {
        // Spark Round(DoubleType, 0): BigDecimal over the shortest
        // decimal string, HALF_UP — replayed verbatim
        val r = elem(a, i) * 127.0 / maxabs
        codes(i) = BigDecimal(r)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong
        i += 1
      }
    }
    var err2 = 0.0
    var codeSum = 0L
    var codeSqSum = 0L
    i = 0
    while (i < n) {
      val c = codes(i)
      val e = elem(a, i) - (c.toDouble * maxabs) / 127.0
      err2 += e * e
      codeSum += c
      codeSqSum += c * c
      i += 1
    }
    new GenericInternalRow(Array[Any](maxabs,
      UnsafeArrayData.fromPrimitiveArray(codes), err2, codeSum, codeSqSum))
  }

  override def nullSafeEval(a: Any): Any =
    computeJava(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("q8", this)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |boolean ${ev.isNull} = ${childGen.isNull};
        |InternalRow ${ev.value} = ${ev.isNull} ? null
        |  : $self.computeJava((ArrayData) ${childGen.value});
        """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeOps {
  /** Column API for [[QuantizeInt8Stats]]: input `array<float>` or
    * `array<double>`, non-null elements (corpus contract). */
  def int8Stats(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Stats(ColumnBridge.expression(v)))
}
