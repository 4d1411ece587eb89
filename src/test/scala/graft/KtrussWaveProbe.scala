package graft

import org.apache.spark.sql.functions._

/** Per-wave timing of the k-truss peel loop (mirrors
  * Ranking.kTrussFromSupports step for step) to find where the sf1
  * peel's 25 s actually goes. */
object KtrussWaveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val e = queries.GraphQueries.callEdges(spark, dir)
    var t0 = System.nanoTime()
    def lap(m: String): Unit = {
      println(f"$m: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    var sup = graph.Ranking.edgeSupportIndex(e).localCheckpoint(true)
    sup.count()
    lap("support index")
    val k = 4
    var round = 0
    var converged = false
    while (round < 6 && !converged) {
      val removed = sup.filter(col("support") < k - 2).localCheckpoint(true)
      lap(s"r$round removed ckpt (${removed.count()} rows)")
      if (removed.isEmpty) converged = true
      else {
        val kept = sup.filter(col("support") >= k - 2).localCheckpoint(true)
        lap(s"r$round kept ckpt (${kept.count()} rows)")
        val und = kept.select("a", "b")
        val touched = removed.select(col("a").as("t"))
          .unionByName(removed.select(col("b").as("t"))).distinct()
        val aff = und.join(touched, col("a") === col("t"), "left_semi")
          .unionByName(und.join(touched, col("b") === col("t"), "left_semi"))
          .distinct()
        val fresh = graft.graph.Ranking.probeSupportsFor(und, aff)
        sup = kept.join(fresh.withColumnRenamed("support", "s2"),
            Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            coalesce(col("s2"), col("support")).as("support"))
          .localCheckpoint(true)
        lap(s"r$round remeasure+ckpt (${sup.count()} rows)")
      }
      round += 1
    }
    spark.stop()
  }
}
