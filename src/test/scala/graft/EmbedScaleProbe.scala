package graft

import graft.pipeline.Similarity

/** One-off probe (sbt Test/runMain graft.EmbedScaleProbe [dir]):
  * embedding near-dup at 10× corpus — fixed 24×5 banding vs
  * bandingFor-sized signatures at dedup-realistic thresholds.
  * Numbers go to SURVEY.md §8.
  */
object EmbedScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale_sf1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir).cache()
    val n = emb.count()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    Seq(0.4, 0.9).foreach { tau =>
      val (bands, planes) = Similarity.bandingFor(n, tau)
      val (tAuto, nAuto) = time(
        Similarity.embeddingNearDup(emb, tau, bands, planes).count())
      println(f"n=$n tau=$tau auto=(${bands}x$planes) ${tAuto}%7.2fs pairs=$nAuto")
    }
    val (tFixed, nFixed) = time(Similarity.embeddingNearDup(emb, 0.9).count())
    println(f"n=$n tau=0.9 fixed=(24x5) ${tFixed}%7.2fs pairs=$nFixed")
    spark.stop()
  }
}
