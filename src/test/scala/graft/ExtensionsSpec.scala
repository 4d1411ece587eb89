package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, Skew}

class ExtensionsSpec extends AnyFunSuite {

  test("SQL users reach graft expressions (runtime registration path)") {
    val spark = GraftSession.local(4)
    graft.functions.GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val h1 = spark.sql("SELECT graft_token_hash('hello') AS h")
      .collect()(0).getLong(0)
    val h2 = spark.sql("SELECT graft_token_hash('hello') AS h")
      .collect()(0).getLong(0)
    assert(h1 == h2 && h1 > 0)
    // aggregate function path: top-2 by score with id tiebreak
    val top = spark.sql(
      """SELECT g, graft_topk(s, i, 2) AS top FROM VALUES
        |  (1, 0.5D, 10L), (1, 0.9D, 11L), (1, 0.9D, 7L), (1, 0.1D, 3L)
        |  AS t(g, s, i)
        |GROUP BY g""".stripMargin)
      .selectExpr("top.id AS ids").collect()(0).getSeq[Long](0)
    assert(top == Seq(7L, 11L)) // 0.9 tie broken by smaller id first
    // implicit input casts: FLOAT score + INT id coerce instead of
    // crashing at execution time
    val cast = spark.sql(
      """SELECT graft_topk(CAST(s AS FLOAT), i, 1) AS top FROM VALUES
        |  (0.5, 10), (0.9, 11) AS t(s, i)""".stripMargin)
      .selectExpr("top.id AS ids").collect()(0).getSeq[Long](0)
    assert(cast == Seq(11L))
  }

  test("salted join equals plain join") {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val plain = big.join(small, "k").count()
    val salted = Skew.saltedJoin(big, small, "k").count()
    assert(plain == salted)
  }
}
