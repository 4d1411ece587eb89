package graft

import org.apache.spark.sql.functions._

/** Measures support-index maintenance under a deletion delta: times
  * the two candidate plans — (full) re-measure of the surviving
  * graph and (incident) re-measure of only delta-incident edges —
  * against the derived callgraph, asserting value equality when both
  * run. Args: dir [zeros] [mode], where the delta is the md5-prefix
  * 16^-zeros cut of the edge set and mode ∈ both|full|incident
  * (incident-only exists for the heap regime where the full plan's
  * Σdeg array shuffle cannot run at all — the regime
  * Ranking.maintainSupports dispatches on).
  *
  * Calibration record (this probe, 32 threads, both sides
  * checkpoint+count their result):
  *   sf0.1 0.59M edges, 24g: full 2.6 s  vs incident  4.1 s (152-edge delta)
  *   sf1   6M edges,   24g: full 4.8 s  vs incident  7.9 s (79-edge delta)
  *   sf10  60M edges,  64g: full 38.6 s vs incident 49.9 s (949-edge delta)
  *   sf10  60M edges,  24g: full DIES (the ~230 GB Σdeg intersect
  *        shuffle fills the disk once the adjacency exceeds the
  *        broadcast budget); incident completes in 74.9 s from the
  *        persisted index — the regime maintainSupports dispatches on.
  */
object SupportMaintainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val zeros = args.lift(1).map(_.toInt).getOrElse(2)
    val mode = args.lift(2).getOrElse("both")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val e = queries.GraphQueries.callEdges(spark, dir)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // GRAFT_SUP_INDEX: read yesterday's PERSISTED index (the real
    // maintenance input) instead of re-deriving it — also the only
    // way to probe a heap regime whose driver cannot build the index
    // from scratch at all
    val (sup0, tIndex) = timed {
      val s = sys.env.get("GRAFT_SUP_INDEX") match {
        case Some(p) => spark.read.parquet(p).localCheckpoint(true)
        case None => graph.Ranking.edgeSupportIndex(e).localCheckpoint(true)
      }
      s.count(); s
    }
    sys.env.get("GRAFT_SUP_INDEX_SAVE").foreach { p =>
      sup0.write.mode("overwrite").parquet(p)
    }
    val removed = sup0.select("a", "b")
      .filter(substring(md5(concat_ws("_", col("a"), col("b"))), 1, zeros)
        === "0" * zeros)
      .localCheckpoint(true)
    val nRemoved = removed.count()

    val runFull = mode != "incident"
    val runInc = mode != "full"

    val (fullIdx, tFull) =
      if (runFull) timed {
        val surviving = sup0.select("a", "b")
          .join(removed, Seq("a", "b"), "left_anti").localCheckpoint(true)
        val s = graph.Ranking.probeEdgeSupports(surviving, None)
          .localCheckpoint(true)
        s.count(); Option(s)
      } else (None, -1.0)
    val (incIdx, tInc) =
      if (runInc) timed {
        val kept = sup0.join(removed, Seq("a", "b"), "left_anti")
          .localCheckpoint(true)
        val m = graph.Ranking.maintainSupportsIncident(kept, removed)
          .localCheckpoint(true)
        m.count(); Option(m)
      } else (None, -1.0)

    for (f <- fullIdx; i <- incIdx) {
      val diff = f.unionByName(i)
        .groupBy("a", "b", "support").agg(count(lit(1)).as("n"))
        .filter(col("n") =!= 2).count()
      require(diff == 0L, s"plans diverged on $diff rows")
    }

    println(
      s"""{"probe":"support_maintain","dir":"$dir","edges":${sup0.count()},""" +
        s""""removed":$nRemoved,"full_s":$tFull,"incident_s":$tInc,""" +
        s""""initial_index_s":$tIndex,"mode":"$mode"}""")
    spark.stop()
  }
}
