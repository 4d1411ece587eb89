package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Components, Pregel, Traversal}
import graft.queries.GraphQueries

/** GraphX/Pregel paths agree with the DataFrame formulations. */
class PregelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("pregel connected components == label propagation on hierarchy graph") {
    val edges = GraphQueries.hierarchyEdges(spark, "/root/testdata/sf0.001")
    val lp = Components.labelPropagation(edges, maxIter = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val px = Pregel.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(px == lp)
  }

  test("pregel bfs depths == join-loop bfs (bounded case)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (9L, 1L))
      .toDF("src", "dst")
    val px = Pregel.bfsDepths(spark, edges, source = 1L)
      .filter("depth > 0").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val df = Traversal.bfs(edges.withColumn("offset",
        org.apache.spark.sql.functions.lit(0L)), Seq(1L).toDF("node"), maxDepth = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(px == df)
  }
}
