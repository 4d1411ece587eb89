package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperANF register-bank helpers (Traversal.anfApprox) — the fused
  * forms of the two interpreted higher-order-function passes the
  * register path still carried: the per-node seed transform and the
  * final harmonic-estimate folds. Both are row-linear (once per node,
  * not per round), but at corpus scale the boxed 64-element
  * intermediates were the remaining non-codegen allocation on the
  * path.
  */

/** Seed bank: out[i] = (i == idx) ? rho : 0 over m registers. */
case class HllRegisterSeed(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(idx: Any, rho: Any): Any = {
    val out = new Array[Int](m)
    out(idx.asInstanceOf[Int]) = rho.asInstanceOf[Int]
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("seed", this)
    nullSafeCodeGen(ctx, ev, (idx, rho) => {
      s"${ev.value} = (ArrayData) $self.nullSafeEval($idx, $rho);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Harmonic-estimate folds over one m-int register bank, both in one
  * pass: z = Σ 2^(−reg_i) accumulated in array order (the sequential
  * `aggregate` fold order, so the double sum is bit-identical), and
  * zeros = |{i : reg_i = 0}|. Returns struct(z double, zeros int). */
case class HllZFold(child: Expression, m: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("z", DoubleType, nullable = false),
    StructField("zeros", IntegerType, nullable = false)))

  def computeJava(a: ArrayData): InternalRow = {
    val n = math.min(m, a.numElements())
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < n) {
      val r = a.getInt(i)
      z += math.pow(2.0, -r.toDouble)
      if (r == 0) zeros += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](z, zeros))
  }

  override def nullSafeEval(a: Any): Any =
    computeJava(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zf", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (InternalRow) $self.computeJava($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HllOps {
  /** Column API for [[HllRegisterSeed]]: int idx in [0, m), int rho. */
  def seedRegister(idx: Column, rho: Column, m: Int): Column =
    ColumnBridge.column(HllRegisterSeed(
      ColumnBridge.expression(idx), ColumnBridge.expression(rho), m))

  /** Column API for [[HllZFold]]: m-int register bank →
    * struct(z, zeros). */
  def zFold(regs: Column, m: Int): Column =
    ColumnBridge.column(HllZFold(ColumnBridge.expression(regs), m))
}
