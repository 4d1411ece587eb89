package graft
import org.apache.spark.sql.functions._
object SccProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val e = queries.GraphQueries.callEdges(spark, "/root/testdata/sf0.1")
    e.count()
    // phase timing: trim fixpoint alone vs full scc
    var t0 = System.nanoTime()
    val deg = e.select(col("src").as("node"), lit(0).as("side"))
      .unionByName(e.select(col("dst").as("node"), lit(1).as("side")))
      .groupBy("node").agg(countDistinct(col("side")).as("ns"))
    println(s"nodes=${deg.count()} both-sides=${deg.filter(col("ns")===2).count()}")
    println(f"degree agg: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val r = graph.Components.stronglyConnected(e)
    println(s"scc rows=${r.count()}")
    println(f"full scc: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
