package graft
import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: every SparkEntry query timed N times
  * (default 3), per-query MEDIAN reported — single-run numbers on a
  * busy local[32] JVM swing up to 3× on untouched code (observed
  * r1→r2), so medians are the minimum honest methodology. One JSON
  * line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet reader) and file-system cache so
    // the first timed query is not charged session startup.
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // A thrown query must not masquerade as a fast run: its timing is
    // still reported (the regression is visible) but the error rides
    // along in an "errors" map so the JSON is self-diagnosing.
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      // release prior queries' dead localCheckpoint blocks (ContextCleaner
      // needs a GC) so late queries aren't taxed by earlier ones — see
      // ScaleBench for the observed failure mode
      System.gc()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(160))
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // Optional comma-separated allowlist for targeted re-timing while
    // optimizing one operator (full runs stay the default contract).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      val rs = (1 to runs).map(_ => time(fn))
      name -> ((median(rs.map(_._1)), rs.flatMap(_._2).headOption))
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(e))) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val nErr = results.count { case (_, (_, e)) => e.isDefined }
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":$nErr,"sf":"$sfDir","runs":$runs,"note":"per-query median of $runs runs"}"""
    println(line)
    // The stdout line is the driver contract, but a log-buffer tail
    // capture can truncate it (BENCH_r05.json lost 101 of 166 query
    // timings that way) — so the full JSON is ALSO written to a file
    // that gets committed, making the authoritative numbers loss-proof.
    // Overridable for ad-hoc runs; never fatal (a read-only checkout
    // must not fail the bench).
    // A targeted SPARK_GRAFT_BENCH_ONLY run must not clobber the
    // committed full-board record with a partial one — it writes a
    // file only when SPARK_GRAFT_BENCH_OUT is explicitly set.
    val outFile = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (only.isEmpty) Some("/root/repo/BENCH_LOCAL.json") else None)
    outFile.foreach { f =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
        line + "\n")
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $f: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
