package graft

/** Phase timing for graph_ktruss at an arbitrary SF dir: initial
  * support index vs the incremental peel — run before optimizing
  * (r9 verdict #4 asks sf1 ≤ ~15 s; the question is which phase
  * owns the 27.9 s).
  * Usage: KtrussProbe [sfDir] */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val e = queries.GraphQueries.callEdges(spark, dir)
    println(s"edges=${e.count()}")
    var t0 = System.nanoTime()
    val sup = graph.Ranking.edgeSupportIndex(e).localCheckpoint(true)
    println(s"support rows=${sup.count()}")
    println(f"support index: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val r = graph.Ranking.kTrussFromSupports(sup, k = 4, rounds = 6)
    println(s"truss rows=${r.count()}")
    println(f"peel: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
