package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-vs-full k-truss peel comparison on a real derived
  * graph (r10 verdict #3): times the SAME peel twice from one shared
  * support index — (a) the shipped dispatching form
  * (Ranking.kTrussFromSupports: full recompute on dense waves,
  * incident-only re-measure on tail waves) and (b) the r9 form that
  * re-measured EVERY surviving edge each wave — and prints one JSON
  * line with both totals plus the per-form wave counts. Run with the
  * organic sf1 dir to see the tail-wave win at the scale it was
  * built for.
  */
object KtrussCompareProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = 4
    val rounds = 6
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val e = queries.GraphQueries.callEdges(spark, dir)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (sup0, tIndex) = timed {
      val s = graph.Ranking.edgeSupportIndex(e).localCheckpoint(true)
      s.count()
      s
    }

    // (a) shipped dispatching peel
    val (incRows, tInc) = timed {
      graph.Ranking.kTrussFromSupports(sup0, k, rounds).count()
    }

    // (b) r9 form: full O(Σdeg²) support recompute on every wave
    val (fullRows, tFull) = timed {
      var sup: DataFrame = sup0
      var prev = sup.count()
      var round = 0
      var converged = false
      while (round < rounds && !converged) {
        val kept = sup.filter(col("support") >= k - 2).localCheckpoint(true)
        val keptCount = kept.count()
        if (prev - keptCount == 0L) converged = true
        else {
          sup = graph.Ranking
            .probeEdgeSupports(kept.select("a", "b"), Some(keptCount))
            .localCheckpoint(true)
          prev = keptCount
        }
        round += 1
      }
      sup.count()
    }

    require(incRows == fullRows,
      s"form divergence: incremental $incRows rows vs full $fullRows")
    println(
      s"""{"probe":"ktruss_compare","dir":"$dir","edges":${e.count()},""" +
        s""""support_index_s":$tIndex,"incremental_s":$tInc,""" +
        s""""full_recompute_s":$tFull,"rows":$incRows}""")
    spark.stop()
  }
}
