package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnConversions, ExpressionColumnNode}

/** Column ⇄ Catalyst-Expression bridge for Spark 4.x, where the
  * `Column` companion and node converters are `private[sql]`. Lives
  * in an `org.apache.spark.sql` subpackage for that access — the
  * standard pattern for libraries shipping custom expressions
  * (cf. Spark's own `DatasetFactory`-style shims in public plugins).
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnConversions.expression(c)

  /** Register a SQL function on an already-built session (the
    * builder-time path is `withExtensions(new GraftExtensions)`;
    * this covers shared/reused sessions). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
