package graft

/** Ad-hoc profiler (sbt "Test/runMain graft.QueryProfile <name> <dir>"):
  * prints the formatted plan and wall time of one SparkEntry query —
  * the `.explain("formatted")` feedback loop for plan iteration.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("fulltext_search")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val df = fn(spark, dir)
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
