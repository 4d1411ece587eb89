package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-truss peel harness-overhead comparison on a real derived graph:
  * times the SAME peel twice from one shared support index — (a) the
  * shipped peel (Ranking.kTrussFromSupports, full support re-measure
  * every wave since r11 removed the tail-wave incident-only dispatch
  * after it lost at every wave of every SF, PROBES_r11.json) and
  * (b) a manual inline loop of the identical full-recompute plan —
  * so the JSON keys measure the shipped driver's checkpoint/count
  * bookkeeping against a bare loop, NOT an incremental strategy
  * (`incremental_s` = shipped peel, kept for artifact continuity;
  * the incremental path itself now lives only in
  * Ranking.maintainSupportsIncident, probed by SupportMaintainProbe).
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

    // (a) shipped peel (full support re-measure every wave)
    val (incRows, tInc) = timed {
      graph.Ranking.kTrussFromSupports(sup0, k, rounds).count()
    }

    // (b) manual r9-style inline loop of the same full recompute —
    // isolates the shipped driver's bookkeeping overhead
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
