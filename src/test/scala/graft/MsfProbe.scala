package graft

import org.apache.spark.sql.functions._

/** One-off phase-timing probe for minSpanningForest at sf0.1 —
  * replicates the operator's phases inline with timestamps to find
  * the cost centers (not a ScalaTest suite). */
object MsfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val edges = graft.queries.GraphQueries.callEdges(spark, dir)
    edges.count()
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      val t1 = System.nanoTime()
      println(f"[probe] $tag%-28s ${(t1 - t0) / 1e9}%7.2f s")
      t0 = t1
    }
    val f = graft.graph.Components.minSpanningForest(edges)
    lap("build plan")
    println("[probe] rows = " + f.count())
    lap("total execute")
    spark.stop()
  }
}
