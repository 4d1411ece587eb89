package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** GraphX/Pregel bridge — the scale path for unbounded-depth graph
  * work (whole-graph components, deep reachability) where the
  * DataFrame join-per-level loop would need too many iterations.
  * DataFrame in → GraphX RDD compute → DataFrame out, so callers stay
  * in the declarative world.
  *
  * This is the batch-ingestion analytics layer the reference delegates
  * to Neo4j's store for (BinaryX-Graph has no whole-graph analytics —
  * Spark adds them).
  */
object Pregel {

  private def toGraph(edges: DataFrame): Graph[Long, Long] = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 0L))
    Graph.fromEdges(e, defaultValue = 0L)
  }

  /** Connected components via GraphX's Pregel implementation; returns
    * (node, component = min reachable vertex id). */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    toGraph(edges).connectedComponents()
      .vertices.map { case (v, c) => (v, c) }
      .toDF("node", "component")
  }

  /** Single-source BFS depths via Pregel (unbounded depth — the deep
    * traversal the join-loop shouldn't do). Returns (node, depth) for
    * reached nodes. */
  def bfsDepths(spark: SparkSession, edges: DataFrame, source: Long): DataFrame = {
    import spark.implicits._
    val g = toGraph(edges).mapVertices((v, _) =>
      if (v == source) 0L else Long.MaxValue)
    val res = g.pregel(Long.MaxValue)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr != Long.MaxValue &&
          triplet.srcAttr + 1L < triplet.dstAttr)
          Iterator((triplet.dstId: VertexId, triplet.srcAttr + 1L))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Long.MaxValue)
      .map { case (v, d) => (v, d) }
      .toDF("node", "depth")
  }
}
