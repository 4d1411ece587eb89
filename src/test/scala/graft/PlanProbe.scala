package graft

/** Ad-hoc executed-plan probe (sbt "Test/runMain graft.PlanProbe <name> <dir>"):
  * runs one SparkEntry query to completion and prints the FINAL adaptive
  * plan — the only place exchange/stage reuse is visible (the static
  * explain shows isFinalPlan=false before AQE has re-planned).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q11_important_parts")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
  }
}
