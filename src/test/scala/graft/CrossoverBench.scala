package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** One-off experiment (sbt Test/runMain graft.CrossoverBench): the
  * D4 (all shared-shingle candidates) vs D4b (rarity-ranked prefix
  * filter) crossover. No sf1 testdata exists, so the corpus is the
  * sf0.1 documents table replicated with shifted doc_ids — a
  * bench-only scaling, never an oracle input. Numbers go to
  * SURVEY.md §7.
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    Seq(1, 4, 8).foreach { k =>
      // every token gets a per-replica suffix: replicas are pairwise
      // dissimilar, so the corpus keeps the base similarity density
      // at k× the size (a plain copy would make every doc a member of
      // a k-clique of exact dups — a duplicate-density benchmark, not
      // a scale benchmark)
      val docs = (0 until k).map(i =>
        base.select((col("doc_id") + lit(i * n)).as("doc_id"),
          regexp_replace(col("text"), "([a-z0-9]+)", s"$$1x$i").as("text")))
        .reduce(_ unionByName _).cache()
      docs.count()
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tPlain = time(Dedup.ngramJaccard(docs, minJaccard = 0.5).count())
      val tPrefix = time(Dedup.ngramJaccardPrefixForced(docs, minJaccard = 0.5).count())
      println(f"docs=${k * n}%6d  plain=$tPlain%6.2fs  prefix=$tPrefix%6.2fs")
      docs.unpersist()
    }
    spark.stop()
  }
}
