package graft

import graft.pipeline.Dedup

/** Ad-hoc D4b dispatch probe (sbt "Test/runMain graft.SkewProbe <dir>..."):
  * prints the measured shingle-df skew multiplier m = Σdf²/Σdf and the
  * wall time of each lossless J≥0.5 plan (plain shared-shingle join vs
  * forced prefix filter) for each corpus — the calibration evidence
  * behind [[Dedup.PrefixSkewCutover]] (numbers go to SURVEY §7).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/organic/sf1")
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    dirs.foreach { dirArg =>
      // "m:<dir>" = multiplier only (skip the joins — the plain path
      // on a hot corpus is exactly the quadratic blow-up under test)
      val mOnly = dirArg.startsWith("m:")
      val dir = if (mOnly) dirArg.drop(2) else dirArg
      val docs = Tables.documents(spark, dir)
      val m = Dedup.prefixSkewMultiplier(docs)
      if (mOnly) println(f"$dir%-28s m=$m%10.1f")
      else {
        val (tPlain, nPlain) = time(Dedup.ngramJaccard(docs, 0.5).count())
        val (tPrefix, nPrefix) = time(
          Dedup.ngramJaccardPrefixForced(docs, 0.5).count())
        println(f"$dir%-28s m=$m%10.1f  plain=$tPlain%7.2fs ($nPlain pairs)  " +
          f"prefix=$tPrefix%7.2fs ($nPrefix pairs)")
      }
    }
    spark.stop()
  }
}
