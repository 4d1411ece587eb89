package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BrandesOps

/** Pins the fused k-wide Brandes register updates (r16) to the
  * higher-order-function forms they replaced, bit for bit, over a
  * randomized state table that exercises every null shape the
  * full_outer/left join rows can produce (state-only, msgs-only,
  * both). A drift here would silently corrupt graph_betweenness's
  * oracle replay, so the parity is asserted row-exactly.
  */
class BrandesOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private val k = 7
  private val t = 2
  private def idx = s"sequence(0, ${k - 1})"

  /** Deterministic pseudo-random state frame with nullable sides:
    * rows 0..n in three null shapes (both present / dist+sigma null /
    * msgs null). dist in {-1..3}, sigma/msgs in {0..5}. */
  private def stateFrame(s: SparkSession): DataFrame = {
    s.range(300).toDF("v")
      .withColumn("dist",
        when(col("v") % 3 === 1, lit(null))
          .otherwise(expr(s"transform($idx, j -> " +
            "cast(pmod(xxhash64(v, j, 1), 5) - 1 as int))")))
      .withColumn("sigma",
        when(col("v") % 3 === 1, lit(null))
          .otherwise(expr(s"transform($idx, j -> pmod(xxhash64(v, j, 2), 6))")))
      .withColumn("m",
        when(col("v") % 3 === 2, lit(null))
          .otherwise(expr(s"transform($idx, j -> pmod(xxhash64(v, j, 3), 6))")))
      .withColumn("delta",
        expr(s"transform($idx, j -> pmod(xxhash64(v, j, 4), 9))"))
      .withColumn("c",
        when(col("v") % 4 === 3, lit(null))
          .otherwise(expr(s"transform($idx, j -> pmod(xxhash64(v, j, 5), 9))")))
  }

  private def assertParity(df: DataFrame, fused: org.apache.spark.sql.Column,
      hof: String): Unit = {
    val bad = df.select(col("v"), fused.as("f"), expr(hof).as("h"))
      .filter(not(col("f") <=> col("h")))
    assert(bad.count() == 0, s"fused != HOF form:\n${bad.take(3).mkString("\n")}")
  }

  test("forwardDist == transform(CASE) over all null shapes") {
    assertParity(stateFrame(spark),
      BrandesOps.forwardDist(col("dist"), col("m"), t, k),
      s"""transform($idx, j -> CASE
          WHEN dist IS NOT NULL AND element_at(dist, j + 1) >= 0
            THEN element_at(dist, j + 1)
          WHEN m IS NOT NULL AND element_at(m, j + 1) > 0 THEN $t
          ELSE -1 END)""")
  }

  test("forwardSigma == transform(CASE) over all null shapes") {
    assertParity(stateFrame(spark),
      BrandesOps.forwardSigma(col("dist"), col("sigma"), col("m"), k),
      s"""transform($idx, j -> CASE
          WHEN sigma IS NOT NULL AND element_at(dist, j + 1) >= 0
            THEN element_at(sigma, j + 1)
          WHEN m IS NOT NULL AND element_at(m, j + 1) > 0
            THEN element_at(m, j + 1)
          ELSE 0 END)""")
  }

  test("deltaUpdate == transform(CASE) incl. null contribution side") {
    val df = stateFrame(spark).filter(col("dist").isNotNull)
    assertParity(df,
      BrandesOps.deltaUpdate(col("dist"), col("delta"), col("c"), t, k),
      s"""transform($idx, j -> CASE
          WHEN element_at(dist, j + 1) = $t
            THEN IF(c IS NULL, 0, element_at(c, j + 1))
          ELSE element_at(delta, j + 1) END)""")
  }

  test("dagEdge == exists(dv >= 0 and dw = dv + 1)") {
    val df = stateFrame(spark).filter(col("dist").isNotNull)
      .withColumn("dv", col("dist"))
      .withColumn("dw",
        expr(s"transform($idx, j -> cast(pmod(xxhash64(v, j, 6), 5) - 1 as int))"))
    assertParity(df,
      BrandesOps.dagEdge(col("dv"), col("dw")),
      s"""exists($idx, j -> element_at(dv, j + 1) >= 0 AND
          element_at(dw, j + 1) = element_at(dv, j + 1) + 1)""")
  }

  test("betweennessSum == aggregate(IF(dist >= 1, delta, 0))") {
    val df = stateFrame(spark).filter(col("dist").isNotNull)
    assertParity(df,
      BrandesOps.betweennessSum(col("dist"), col("delta")),
      s"""aggregate($idx, 0L, (acc, j) ->
          acc + IF(element_at(dist, j + 1) >= 1,
            element_at(delta, j + 1), 0))""")
  }
}
