package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused k-wide register updates for the packed Brandes sweep
  * (Ranking.betweennessSweep) — the LshBandSignature lesson applied
  * to the per-round state transitions: the `transform($idx, j ->
  * CASE …)` / `exists` / `aggregate` higher-order-function forms have
  * no codegen, allocate a boxed intermediate array per row per round,
  * and at k = 64 sources that interpreted per-element dispatch is the
  * dominant per-row cost of the update/filter stages. Each expression
  * below is ONE primitive loop over ArrayData with the HOF form's
  * per-index arithmetic verbatim (exact integer ops, same null
  * semantics), so the oracle's unrolled CTE replay is unchanged bit
  * for bit.
  *
  * Null-handling contract (the full_outer/left join rows): a NULL
  * array child behaves exactly like the SQL form's `x IS NOT NULL AND
  * element_at(x, j+1) …` guards — the branch is skipped, never the
  * row. All outputs are non-null fixed-width k arrays.
  */

/** Forward dist update: per index j —
  * dist[j] >= 0 ? dist[j] : (msgs[j] > 0 ? t : -1), with NULL dist /
  * msgs treated as "branch unavailable". */
case class BrandesForwardDist(dist: Expression, msgs: Expression, t: Int, k: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(dist, msgs)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override lazy val deterministic: Boolean = true

  def computeJava(d: ArrayData, m: ArrayData): ArrayData = {
    val out = new Array[Int](k)
    var j = 0
    while (j < k) {
      out(j) =
        if (d != null && d.getInt(j) >= 0) d.getInt(j)
        else if (m != null && m.getLong(j) > 0L) t
        else -1
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def eval(input: InternalRow): Any =
    computeJava(dist.eval(input).asInstanceOf[ArrayData],
      msgs.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bfd", this)
    val dGen = dist.genCode(ctx)
    val mGen = msgs.genCode(ctx)
    ev.copy(
      code = code"""
        |${dGen.code}
        |${mGen.code}
        |ArrayData ${ev.value} = $self.computeJava(
        |  ${dGen.isNull} ? null : (ArrayData) ${dGen.value},
        |  ${mGen.isNull} ? null : (ArrayData) ${mGen.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), msgs = newChildren(1))
}

/** Forward σ update: per index j —
  * dist[j] >= 0 ? sigma[j] : (msgs[j] > 0 ? msgs[j] : 0), NULL-guarded
  * exactly like the CASE form (dist/sigma null together — one join
  * side; msgs null = no messages). */
case class BrandesForwardSigma(dist: Expression, sigma: Expression,
    msgs: Expression, k: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(dist, sigma, msgs)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override lazy val deterministic: Boolean = true

  def computeJava(d: ArrayData, g: ArrayData, m: ArrayData): ArrayData = {
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      out(j) =
        if (g != null && d != null && d.getInt(j) >= 0) g.getLong(j)
        else if (m != null && m.getLong(j) > 0L) m.getLong(j)
        else 0L
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def eval(input: InternalRow): Any =
    computeJava(dist.eval(input).asInstanceOf[ArrayData],
      sigma.eval(input).asInstanceOf[ArrayData],
      msgs.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bfs", this)
    val dGen = dist.genCode(ctx)
    val gGen = sigma.genCode(ctx)
    val mGen = msgs.genCode(ctx)
    ev.copy(
      code = code"""
        |${dGen.code}
        |${gGen.code}
        |${mGen.code}
        |ArrayData ${ev.value} = $self.computeJava(
        |  ${dGen.isNull} ? null : (ArrayData) ${dGen.value},
        |  ${gGen.isNull} ? null : (ArrayData) ${gGen.value},
        |  ${mGen.isNull} ? null : (ArrayData) ${mGen.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), sigma = newChildren(1), msgs = newChildren(2))
}

/** Backward δ replace-at-level: per index j —
  * dist[j] == t ? (c == null ? 0 : c[j]) : delta[j]. dist/delta are
  * the non-null δ-frame state; c is the left-joined contribution. */
case class BrandesDeltaUpdate(dist: Expression, delta: Expression,
    c: Expression, t: Int, k: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(dist, delta, c)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override lazy val deterministic: Boolean = true

  def computeJava(d: ArrayData, dl: ArrayData, cc: ArrayData): ArrayData = {
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      out(j) =
        if (d.getInt(j) == t) { if (cc == null) 0L else cc.getLong(j) }
        else dl.getLong(j)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def eval(input: InternalRow): Any =
    computeJava(dist.eval(input).asInstanceOf[ArrayData],
      delta.eval(input).asInstanceOf[ArrayData],
      c.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bdu", this)
    val dGen = dist.genCode(ctx)
    val dlGen = delta.genCode(ctx)
    val cGen = c.genCode(ctx)
    ev.copy(
      code = code"""
        |${dGen.code}
        |${dlGen.code}
        |${cGen.code}
        |ArrayData ${ev.value} = $self.computeJava(
        |  ${dGen.isNull} ? null : (ArrayData) ${dGen.value},
        |  ${dlGen.isNull} ? null : (ArrayData) ${dlGen.value},
        |  ${cGen.isNull} ? null : (ArrayData) ${cGen.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), delta = newChildren(1), c = newChildren(2))
}

/** DAG-edge test: ∃ j — dv[j] >= 0 ∧ dw[j] == dv[j] + 1. Runs once
  * per edge ⋈ state ⋈ state row (the |E|-scale filter of the
  * backward-sweep build), early-exits on first hit. */
case class BrandesDagEdge(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val dv = a.asInstanceOf[ArrayData]
    val dw = b.asInstanceOf[ArrayData]
    val n = math.min(dv.numElements(), dw.numElements())
    var j = 0
    while (j < n) {
      val d = dv.getInt(j)
      if (d >= 0 && dw.getInt(j) == d + 1) return true
      j += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  int $d = $a.getInt($j);
         |  if ($d >= 0 && $b.getInt($j) == $d + 1) { ${ev.value} = true; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Final betweenness read-off: Σ_j (dist[j] >= 1 ? delta[j] : 0) —
  * index j with dist 0 is the node's own source row, excluded. */
case class BrandesBetweennessSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val dist = a.asInstanceOf[ArrayData]
    val delta = b.asInstanceOf[ArrayData]
    val n = math.min(dist.numElements(), delta.numElements())
    var s = 0L
    var j = 0
    while (j < n) {
      if (dist.getInt(j) >= 1) s += delta.getLong(j)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.getInt($j) >= 1) $s += $b.getLong($j);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BrandesOps {
  /** dist' = dist[j] >= 0 ? dist[j] : (msgs[j] > 0 ? t : -1). */
  def forwardDist(dist: Column, msgs: Column, t: Int, k: Int): Column =
    ColumnBridge.column(BrandesForwardDist(
      ColumnBridge.expression(dist), ColumnBridge.expression(msgs), t, k))

  /** σ' = dist[j] >= 0 ? σ[j] : (msgs[j] > 0 ? msgs[j] : 0). */
  def forwardSigma(dist: Column, sigma: Column, msgs: Column, k: Int): Column =
    ColumnBridge.column(BrandesForwardSigma(
      ColumnBridge.expression(dist), ColumnBridge.expression(sigma),
      ColumnBridge.expression(msgs), k))

  /** δ' = dist[j] == t ? coalesce(c[j], 0) : δ[j]. */
  def deltaUpdate(dist: Column, delta: Column, c: Column, t: Int, k: Int): Column =
    ColumnBridge.column(BrandesDeltaUpdate(
      ColumnBridge.expression(dist), ColumnBridge.expression(delta),
      ColumnBridge.expression(c), t, k))

  /** ∃ j: dv[j] >= 0 ∧ dw[j] = dv[j] + 1. */
  def dagEdge(dv: Column, dw: Column): Column =
    ColumnBridge.column(BrandesDagEdge(
      ColumnBridge.expression(dv), ColumnBridge.expression(dw)))

  /** Σ_j (dist[j] >= 1 ? δ[j] : 0). */
  def betweennessSum(dist: Column, delta: Column): Column =
    ColumnBridge.column(BrandesBetweennessSum(
      ColumnBridge.expression(dist), ColumnBridge.expression(delta)))
}
