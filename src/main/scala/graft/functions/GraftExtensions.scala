package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the SQL function registry so plain `spark.sql`
  * (and SQL-first users) can call them:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT graft_dot(a, b) FROM vectors")
  * spark.sql("SELECT graft_token_hash(word) FROM tokens")
  * }}}
  *
  * (The DataFrame API reaches the same expressions via
  * [[VectorOps.dotNative]] / [[TextOps.tokenHash]] without needing
  * the extension.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProduct].getName, name),
        b))
    }
}

object GraftExtensions {
  private def bridge = org.apache.spark.sql.graftbridge.ColumnBridge

  /** name → expression builder, shared by the builder-time extension
    * and the runtime [[register]] path. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" ->
      ((children: Seq[Expression]) => DotProduct(children(0), children(1))),
    "graft_token_hash" ->
      ((children: Seq[Expression]) =>
        bridge.expression(TextOps.tokenHash(bridge.column(children.head)))),
    // graft_topk(score, id, k): partial top-k aggregate — k must be a
    // foldable int literal (it shapes the aggregation buffer)
    "graft_topk" ->
      ((children: Seq[Expression]) => {
        if (children.length != 3)
          sys.error(s"graft_topk takes (score, id, k); got ${children.length} args")
        if (!children(2).foldable)
          sys.error("graft_topk k must be a constant int literal")
        val k = children(2).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => sys.error(s"graft_topk k must be an int literal, got $other")
        }
        TopKByScore(children(0), children(1), k).toAggregateExpression()
      }))

  /** Register on an already-built (possibly shared) session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, name, b)
    }
}
